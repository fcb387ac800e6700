"""Deterministic synthetic Common-Crawl-style corpus (fixture F1).

Generates the ``pages`` table in the exact shape mandated by
``BASELINE.json`` ``input_hint``: ``(url:string, warc_ts:timestamp[s],
html:binary, text:string, lang:string)`` — plus ground truth:

- ``expected_triples`` (fixture F3): the (subj, pred, obj) triples planted
  in each page, for P/R scoring of the extraction→linking→canonicalization
  pipeline;
- a closed **gazetteer** (entity id → name/IRI, alias surface → entity id)
  used by the NER/linking stages;
- ``variant_truth``: surface forms deliberately *omitted* from the
  gazetteer (space-dropped / hyphenated / typo variants) that the
  MinHash-LSH + union-find canonicalization stage must cluster back onto
  the true entity.

Page lifecycles replay the reference's versioning semantics as crawl
snapshots (version axis = ``warc_ts``, unix seconds — the reference's git
commit-time axis, ``/root/reference/src/git.rs:82,157``):

- a url may repeat a snapshot with **byte-identical content** → the delta
  stage must suppress it (no-op, ``src/graphs.rs:52-61``;
  ``tests/integration_test.rs:96-125``);
- a url absent from a snapshot while previously live → **delete** tombstone
  (``src/graphs.rs:82-93``); it may later reappear (new update);
- content changes → a new timestamped delta.

Everything derives from one integer seed (``numpy.random.default_rng``);
no wall clock, no external data. ``text`` is the ground-truth extraction of
``html`` — built from the same sentence list, with extra whitespace/entity
escaping injected only on the HTML side so the extractor's normalization is
genuinely exercised.
"""

from __future__ import annotations

import html as _htmlmod
import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .schemas import PAGES

EPOCH = 1704067200  # 2024-01-01T00:00:00Z, unix seconds
SNAPSHOT_STEP = 86400  # one crawl snapshot per day

ENTITY_NS = "https://kg.example/entity/"
PROP_NS = "https://kg.example/prop/"

P_ACQUIRED = PROP_NS + "acquired"
P_PARTNERS = PROP_NS + "partnersWith"
P_HQ = PROP_NS + "headquarteredIn"
P_FOUNDED = PROP_NS + "foundedIn"

_ORG_FIRST = [
    "Acme", "Nordic", "Vertex", "Quantum", "Solar", "Atlas", "Borealis",
    "Cobalt", "Delta", "Ember", "Fjord", "Granite", "Halcyon", "Ivory",
    "Juniper", "Kestrel", "Lumen", "Meridian", "Nimbus", "Orchid",
    "Pinnacle", "Quartz", "Raven", "Summit", "Tundra", "Umbra", "Velvet",
    "Willow", "Xenon", "Yonder", "Zephyr", "Harbor", "Crescent", "Aurora",
]
_ORG_SECOND = [
    "Systems", "Labs", "Industries", "Group", "Analytics", "Dynamics",
    "Software", "Holdings", "Networks", "Partners", "Logistics", "Energy",
    "Robotics", "Capital", "Media", "Works",
]
_CITIES = [
    "Oslo", "Bergen", "Trondheim", "Berlin", "Paris", "Madrid", "Vienna",
    "Dublin", "Prague", "Lisbon", "Helsinki", "Tallinn", "Riga", "Vilnius",
    "Warsaw", "Zurich", "Geneva", "Antwerp", "Rotterdam", "Copenhagen",
]
_DISTRACTORS = [
    "the quarterly report was published on schedule.",
    "earnings guidance remains unchanged for the fiscal year.",
    "no further details were disclosed at this time.",
    "analysts expect continued growth in the sector.",
    "the filing is available from the registry.",
]
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "no", "de"]


def entity_iri(eid: str) -> str:
    return ENTITY_NS + eid


@dataclass
class Corpus:
    pages: pa.Table
    expected_triples: pa.Table
    gazetteer: dict
    variant_truth: dict  # unknown surface -> eid
    snapshot_times: list  # unix seconds, ascending
    links: pa.Table | None = None  # ground truth when n_links > 0

    def write(self, out_dir: str) -> None:
        import os

        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        # Read parallelism is FILE granularity (Ray issues one read task
        # per file; splitting inside a file's row group re-decodes it
        # whole): shard big corpora into a directory of part files, keep
        # bounded row groups within each.
        shard_rows = 16384
        n = self.pages.num_rows
        if n > shard_rows:
            pdir = f"{out_dir}/pages.parquet"
            os.makedirs(pdir, exist_ok=True)
            i = 0
            for off in range(0, n, shard_rows):
                pq.write_table(
                    self.pages.slice(off, shard_rows),
                    f"{pdir}/part-{i:05d}.parquet",
                    row_group_size=2048,
                )
                i += 1
        else:
            pq.write_table(self.pages, f"{out_dir}/pages.parquet",
                           row_group_size=2048)
        pq.write_table(self.expected_triples, f"{out_dir}/expected_triples.parquet")
        with open(f"{out_dir}/gazetteer.json", "w") as f:
            json.dump(self.gazetteer, f, sort_keys=True)
        with open(f"{out_dir}/variant_truth.json", "w") as f:
            json.dump(self.variant_truth, f, sort_keys=True)


@dataclass
class _Entity:
    eid: str
    name: str
    aliases: list = field(default_factory=list)  # in gazetteer
    variants: list = field(default_factory=list)  # NOT in gazetteer


def _norm_name(s: str) -> str:
    """Names must be unique under casefold+strip-non-alnum so that the
    canonicalizer's exact-normalized merge can never conflate two distinct
    entities (see ``stages.canonicalize.normalize_surface``)."""
    import re as _re

    return _re.sub(r"[^a-z0-9]+", "", s.casefold())


def _make_entities(n_orgs: int, rng: np.random.Generator):
    ents: list[_Entity] = []
    used_norms: set[str] = set()
    i = 0
    while len(ents) < n_orgs:
        first = _ORG_FIRST[int(rng.integers(len(_ORG_FIRST)))]
        second = _ORG_SECOND[int(rng.integers(len(_ORG_SECOND)))]
        joiner = " & " if rng.random() < 0.08 else " "
        name = f"{first}{joiner}{second}"
        if _norm_name(name) in used_norms:
            i += 1
            if i > 100 * n_orgs:  # name space exhausted at huge n
                name = f"{first} {second} {len(ents)}"
            else:
                continue
        used_norms.add(_norm_name(name))
        e = _Entity(eid=f"E{len(ents):06d}", name=name)
        e.aliases.append(name)
        # a short alias sometimes (known to the gazetteer)
        if joiner == " " and rng.random() < 0.35:
            short = first
            if _norm_name(short) not in used_norms:
                used_norms.add(_norm_name(short))
                e.aliases.append(short)
        # unknown variants (for MinHash-LSH canonicalization to recover)
        r = rng.random()
        if r < 0.30:
            e.variants.append(name.replace(" & ", " and ").replace(" ", ""))
        elif r < 0.55:
            e.variants.append(name.replace(" & ", "-").replace(" ", "-"))
        ents.append(e)
    cities = [
        _Entity(eid=f"C{j:04d}", name=c, aliases=[c]) for j, c in enumerate(_CITIES)
    ]
    return ents, cities


def _sentence(kind: str, a: str, b: str) -> str:
    if kind == "acq":
        return f"{a} acquired {b}."
    if kind == "partner":
        return f"{a} partners with {b}."
    if kind == "hq":
        return f"{a} is headquartered in {b}."
    if kind == "founded":
        return f"{a} was founded in {b}."
    raise ValueError(kind)


_KIND_PRED = {"acq": P_ACQUIRED, "partner": P_PARTNERS, "hq": P_HQ, "founded": P_FOUNDED}


def _surface_for(e: _Entity, rng: np.random.Generator) -> str:
    """Pick how this entity is written on the page: canonical name, a known
    alias, or an unknown variant (exercises canonicalization)."""
    r = rng.random()
    if e.variants and r < 0.18:
        return e.variants[int(rng.integers(len(e.variants)))]
    if len(e.aliases) > 1 and r < 0.35:
        return e.aliases[1]
    return e.name


def _page_facts(primary: _Entity, orgs, cities, rng: np.random.Generator,
                entity_skew: float = 0.0):
    """The fact set for one url: (kind, subj_entity, obj_entity_or_literal).
    Facts are stable per url; snapshots add/remove/alter from this pool.
    ``entity_skew`` > 0 draws relation partners power-law style (head
    entities get most mentions); 0 keeps the uniform stream byte-stable."""
    facts = []
    n_rel = 2 + int(rng.integers(4))
    for _ in range(n_rel):
        kind = ["acq", "partner", "hq", "founded"][int(rng.integers(4))]
        if kind in ("acq", "partner"):
            if entity_skew > 0:
                other = orgs[
                    min(len(orgs) - 1,
                        int(len(orgs) * rng.random() ** (1.0 + entity_skew)))
                ]
            else:
                other = orgs[int(rng.integers(len(orgs)))]
            if other.eid == primary.eid:
                kind = "founded"
                facts.append((kind, primary, str(1900 + int(rng.integers(125)))))
            else:
                facts.append((kind, primary, other))
        elif kind == "hq":
            facts.append((kind, primary, cities[int(rng.integers(len(cities)))]))
        else:
            facts.append((kind, primary, str(1900 + int(rng.integers(125)))))
    return facts


def _render(title: str, sentences, rng: np.random.Generator,
            links: list | None = None, plain_sentences=()):
    """Build (html_bytes, ground_truth_text). HTML-side-only noise: entity
    escaping, random double spaces, tab indentation — the extractor must
    normalize all of it away to reproduce ``text`` byte-identically.
    ``links`` (hrefs, optional) render inside ``<nav>``, which the
    extractor drops wholesale — link density never perturbs the
    extraction ground truth, and ``links=None`` emits byte-identical
    pages to the pre-knob corpus. ``plain_sentences`` render after the
    main body WITHOUT the per-sentence noise coin (no main-rng draw), so
    the vocab knob never perturbs the default corpus stream."""
    text = "\n".join([title] + list(sentences) + list(plain_sentences))

    def noisy(s: str) -> str:
        esc = _htmlmod.escape(s)
        if rng.random() < 0.3:
            esc = esc.replace(" ", "  ", 1)
        return esc

    nav_links = "".join(
        f' | <a href="{_htmlmod.escape(h, quote=True)}">ref</a>'
        for h in (links or [])
    )
    paras = "\n".join(
        [f"\t<p>{noisy(s)}</p>" for s in sentences]
        + [f"\t<p>{_htmlmod.escape(s)}</p>" for s in plain_sentences]
    )
    doc = (
        "<html><head><title>corpus page</title>"
        "<script>var t=1;</script><style>.x{color:red}</style></head>\n"
        "<body>\n"
        '<nav><a href="/">Home</a> | <a href="/about">About</a>'
        f"{nav_links}</nav>\n"
        "<header><h2>site banner</h2></header>\n"
        f"<main>\n<h1>{noisy(title)}</h1>\n{paras}\n</main>\n"
        "<footer>(c) 2024 example.org - generated</footer>\n"
        "</body></html>"
    )
    return doc.encode("utf-8"), text


_FILLER_TOPICS = [
    "logistics", "archives", "catalogues", "inventories", "manifests",
    "procedures", "registries", "schedules", "standards", "templates",
]


def _filler_pool(rng: np.random.Generator, size: int = 256) -> list:
    """Deterministic boilerplate-free body filler: lowercase prose lines
    that never match a relation pattern or a mention span, sized to make
    per-page extraction work realistic (real web pages are tens of KB,
    not three sentences)."""
    out = []
    for i in range(size):
        t1 = _FILLER_TOPICS[int(rng.integers(len(_FILLER_TOPICS)))]
        t2 = _FILLER_TOPICS[int(rng.integers(len(_FILLER_TOPICS)))]
        n = int(rng.integers(1000))
        out.append(
            f"section {n:04d} of the {t1} records cross-references the {t2} "
            f"index maintained since revision {int(rng.integers(90)) + 10}."
        )
    return out


def _page_url(u: int) -> str:
    return f"https://site{u % 7}.example/page{u:06d}"


def generate(n_urls: int = 60, n_snapshots: int = 5, seed: int = 42,
             filler_sentences: int = 0, entity_skew: float = 0.0,
             n_links: int = 0, vocab_per_page: int = 0) -> Corpus:
    """Deterministic corpus. ~``n_urls * n_snapshots * 0.8`` page rows.
    ``filler_sentences`` > 0 pads every page with that many deterministic
    non-fact body sentences (bench realism knob; default 0 keeps the
    small test corpora byte-stable). ``entity_skew`` > 0 draws relation
    partners power-law style (``index = n * u^(1+skew)``): a few head
    entities dominate mentions — the high-degree-node case the north
    rule's skew handling must survive. 0 keeps the uniform draw.
    ``n_links`` > 0 puts that many ``<a href>`` anchors in each rendered
    page's ``<nav>`` (absolute / root-relative / relative / fragment
    forms) and fills :attr:`Corpus.links` with the per-page-row ground
    truth ``(url, warc_ts, href, resolved)`` — ``resolved`` is the
    CANONICAL absolute target (fragment dropped), i.e. what resolve →
    canonicalize should produce. The draws come from a SEPARATE rng
    stream, so the default corpus stays byte-stable.

    ``vocab_per_page`` > 0 plants that many UNIQUE random two-word org
    surfaces per url, each in a ``was founded in <year>`` sentence
    (literal object — entity names can carry digit suffixes at large
    ``n_orgs``, which the MENTION pattern rejects; a literal object
    extracts at every scale), stable across the url's snapshots:
    distinct surfaces then grow LINEARLY with pages instead of the
    default's capped gazetteer vocabulary — the knob behind the
    driver-vs-distributed canonical-map divergence measurement
    (BASELINE.md). Separate rng stream; 0 keeps every default corpus
    byte-stable."""
    rng = np.random.default_rng(seed)
    link_rng = (np.random.default_rng(seed * 1_000_003 + 424_243)
                if n_links else None)
    boost_surfs: list[str] = []
    if vocab_per_page:
        vrng = np.random.default_rng(seed * 1_000_003 + 90_071)
        n_boost = n_urls * vocab_per_page
        raw = (vrng.integers(0, 26, size=(n_boost, 14), dtype=np.uint8)
               + 97).tobytes()
        for i in range(n_boost):
            off = i * 14
            boost_surfs.append(
                raw[off:off + 7].decode().capitalize() + " "
                + raw[off + 7:off + 14].decode().capitalize()
            )
    lcols: dict = {k: [] for k in ("url", "warc_ts", "href", "resolved")}
    filler = _filler_pool(rng) if filler_sentences else []
    # entity vocabulary grows sublinearly and is capped: a web corpus 10×
    # bigger does not carry 10× more distinct organizations, and the
    # canonicalization stage is sized for a bounded vocabulary
    n_orgs = max(20, min(5000, n_urls // 3))
    orgs, cities = _make_entities(n_orgs, rng)
    snapshot_times = [EPOCH + k * SNAPSHOT_STEP for k in range(n_snapshots)]

    gaz_alias: dict[str, str] = {}
    for e in orgs + cities:
        for a in e.aliases:
            gaz_alias.setdefault(a, e.eid)
    gazetteer = {
        "alias_to_eid": gaz_alias,
        "entities": {
            e.eid: {"name": e.name, "iri": entity_iri(e.eid)} for e in orgs + cities
        },
    }
    variant_truth = {}
    for e in orgs:
        for v in e.variants:
            if v not in gaz_alias:
                variant_truth[v] = e.eid

    cols = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    tcols = {
        k: []
        for k in ("subj", "pred", "obj", "obj_is_literal", "graph_id", "warc_ts")
    }

    for u in range(n_urls):
        primary = orgs[u % len(orgs)]
        url = _page_url(u)
        lang = _LANGS[int(rng.integers(len(_LANGS)))]
        facts = _page_facts(primary, orgs, cities, rng, entity_skew)
        title = f"{primary.name} company profile"
        start = int(rng.integers(max(1, n_snapshots - 1)))
        alive = False
        active: list[int] = []  # indices into facts currently on the page
        rendered = None  # (html, text) of last emitted state
        for k, ts in enumerate(snapshot_times):
            if k < start:
                continue
            if not alive:
                if k == start or rng.random() < 0.35:  # (re)appear
                    alive = True
                    active = list(range(1 + int(rng.integers(len(facts)))))
                    rendered = None
                else:
                    continue
            else:
                r = rng.random()
                if r < 0.12:  # vanishes from this snapshot → delete
                    alive = False
                    rendered = None
                    continue
                if r < 0.47:  # content change: toggle one fact
                    j = int(rng.integers(len(facts)))
                    if j in active and len(active) > 1:
                        active.remove(j)
                    elif j not in active:
                        active.append(j)
                        active.sort()
                # else: byte-identical re-crawl (no-op case)
            # Surfaces must be stable across no-op snapshots: render only
            # when content actually changed, reuse the bytes verbatim
            # otherwise (that is what makes the no-op digest-equal).
            if rendered is None:
                sent_texts, trips = [], []
                for j in active:
                    kind, subj_e, obj = facts[j]
                    s_surf = _surface_for(subj_e, rng)
                    if isinstance(obj, _Entity):
                        o_surf = _surface_for(obj, rng)
                        o_iri, o_lit = entity_iri(obj.eid), False
                    else:
                        o_surf, o_iri, o_lit = obj, obj, True
                    sent_texts.append(_sentence(kind, s_surf, o_surf))
                    trips.append((entity_iri(subj_e.eid), _KIND_PRED[kind], o_iri, o_lit))
                boost_texts = []
                if vocab_per_page:
                    # stable per url; subjects are singleton clusters so
                    # their canonical IRI is the surface slug. The object
                    # is a literal year: entity names can carry digit
                    # suffixes at large n_orgs, which the MENTION pattern
                    # rejects — a literal object extracts at every scale.
                    from .stages.link import surface_slug

                    for j, b in enumerate(
                            boost_surfs[u * vocab_per_page:
                                        (u + 1) * vocab_per_page]):
                        year = str(1900 + (u + j) % 125)
                        boost_texts.append(_sentence("founded", b, year))
                        trips.append((ENTITY_NS + surface_slug(b),
                                      P_FOUNDED, year, True))
                if rng.random() < 0.4:
                    sent_texts.append(
                        _DISTRACTORS[int(rng.integers(len(_DISTRACTORS)))]
                    )
                for _ in range(filler_sentences):
                    sent_texts.append(filler[int(rng.integers(len(filler)))])
                page_links = []
                if n_links:
                    host = f"https://site{u % 7}.example"
                    for _ in range(n_links):
                        v = int(link_rng.integers(n_urls))
                        form = int(link_rng.integers(4))
                        target = _page_url(v)
                        if form == 0:  # absolute (often cross-host)
                            page_links.append((target, target))
                        elif form == 1:  # root-relative, same host
                            page_links.append(
                                (f"/page{v:06d}", f"{host}/page{v:06d}"))
                        elif form == 2:  # relative (base dir is "/")
                            page_links.append(
                                (f"page{v:06d}", f"{host}/page{v:06d}"))
                        else:  # absolute + fragment (canonicalizer drops)
                            page_links.append((f"{target}#sec", target))
                html_b, text = _render(
                    title, sent_texts, rng,
                    links=[h for h, _ in page_links] or None,
                    plain_sentences=boost_texts)
                rendered = (html_b, text, trips, page_links)
            html_b, text, trips, page_links = rendered
            cols["url"].append(url)
            cols["warc_ts"].append(ts)
            cols["html"].append(html_b)
            cols["text"].append(text)
            cols["lang"].append(lang)
            for href, res in page_links:
                lcols["url"].append(url)
                lcols["warc_ts"].append(ts)
                lcols["href"].append(href)
                lcols["resolved"].append(res)
            for s, p, o, lit in trips:
                tcols["subj"].append(s)
                tcols["pred"].append(p)
                tcols["obj"].append(o)
                tcols["obj_is_literal"].append(lit)
                tcols["graph_id"].append(url)
                tcols["warc_ts"].append(ts)

    pages = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("s")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    ).cast(PAGES)
    expected = pa.table(
        {
            "subj": pa.array(tcols["subj"], pa.string()),
            "pred": pa.array(tcols["pred"], pa.string()),
            "obj": pa.array(tcols["obj"], pa.string()),
            "obj_is_literal": pa.array(tcols["obj_is_literal"], pa.bool_()),
            "graph_id": pa.array(tcols["graph_id"], pa.string()),
            "warc_ts": pa.array(tcols["warc_ts"], pa.timestamp("s")),
        }
    )
    links = None
    if n_links:
        links = pa.table(
            {
                "url": pa.array(lcols["url"], pa.string()),
                "warc_ts": pa.array(lcols["warc_ts"], pa.timestamp("s")),
                "href": pa.array(lcols["href"], pa.string()),
                "resolved": pa.array(lcols["resolved"], pa.string()),
            }
        )
    return Corpus(pages, expected, gazetteer, variant_truth, snapshot_times,
                  links)
