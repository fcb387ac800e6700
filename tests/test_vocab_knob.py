"""Vocabulary-growth corpus knob (corpus.generate(vocab_per_page=)):
distinct surfaces grow linearly with pages — the planted-truth input
behind the driver-vs-distributed canonical-map divergence measurement
(BASELINE.md round 5). The knob must not perturb the default RNG stream
(CLAUDE.md byte-stability invariant) and its planted facts must survive
the full extraction → linking → canonicalization pipeline."""

import pyarrow.dataset as pads
import pytest

from rdf_diff_store_ray import corpus


def test_knob_never_perturbs_default_stream():
    """Same seed, knob on vs off: identical lifecycles (url, ts) and the
    knob-on text is the knob-off text plus appended plain sentences."""
    c0 = corpus.generate(n_urls=30, n_snapshots=3, seed=42)
    c1 = corpus.generate(n_urls=30, n_snapshots=3, seed=42,
                         vocab_per_page=3)
    assert c0.pages.num_rows == c1.pages.num_rows
    assert c0.pages["url"].to_pylist() == c1.pages["url"].to_pylist()
    assert c0.pages["warc_ts"].to_pylist() == c1.pages["warc_ts"].to_pylist()
    for a, b in zip(c0.pages["text"].to_pylist(),
                    c1.pages["text"].to_pylist()):
        assert b.startswith(a)
        extra = b[len(a):].strip("\n").split("\n")
        assert len(extra) == 3
        assert all("was founded in" in s for s in extra)


def test_vocabulary_grows_linearly_with_pages():
    subj = {}
    for n in (30, 60, 120):
        c = corpus.generate(n_urls=n, n_snapshots=3, seed=42,
                            vocab_per_page=3)
        subj[n] = len(set(c.expected_triples["subj"].to_pylist()))
    # at least 3 unique boost subjects per extra url (the base gazetteer
    # vocabulary may also grow a little with n_urls)
    assert 90 <= subj[60] - subj[30] <= 120
    assert 180 <= subj[120] - subj[60] <= 240


def test_boost_facts_survive_the_full_build(ray_session, tmp_path):
    """End-to-end: boost subjects are singleton clusters, so the pipeline
    must emit their triples with the surface-slug IRI the corpus
    predicted — P/R >= 0.95 with the boost triples included in truth."""
    from rdf_diff_store_ray.pipelines.build import build

    c = corpus.generate(n_urls=40, n_snapshots=3, seed=17, vocab_per_page=2)
    c.write(str(tmp_path / "corpus"))
    res = build(str(tmp_path / "corpus" / "pages.parquet"),
                str(tmp_path / "kg"), gazetteer=c.gazetteer,
                num_partitions=4, resume=False)
    tt = pads.dataset(res.triples_dir).to_table()
    got = set(zip(tt["subj"].to_pylist(), tt["pred"].to_pylist(),
                  tt["obj"].to_pylist()))
    exp = c.expected_triples
    want = set(zip(exp["subj"].to_pylist(), exp["pred"].to_pylist(),
                   exp["obj"].to_pylist()))
    boost_want = {t for t in want if "/prop/foundedIn" in t[1]
                  and t[0].count("-") >= 1}
    assert len(boost_want) >= 40  # the knob actually planted facts
    tp = len(got & want)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(want)) >= 0.95
    # the boost facts specifically were recovered (not just the base set)
    assert len(got & boost_want) / len(boost_want) >= 0.95
