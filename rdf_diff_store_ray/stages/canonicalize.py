"""Entity canonicalization: MinHash-LSH over surface forms + union-find.

Pipeline shape (SURVEY §7.1 step 6):

1. distinct surface forms (corpus surfaces ∪ gazetteer aliases) —
   per-batch partial dedup, then a grouped distinct (small shuffle over the
   *vocabulary*, not the corpus);
2. exact edges: surfaces sharing a normalized form (casefold, strip
   non-alphanumerics) are linked directly — collapses space/hyphen/'&'
   variants with no approximation;
3. fuzzy candidates: per-surface MinHash signature over character
   3-shingles of the normalized form (vectorized numpy, permutations
   precomputed once per actor) → explode to ``(band_id, band_hash)``
   bucket rows → ``groupby`` on the band key (the LSH shuffle) →
   candidate pairs per bucket, with a **deterministic cap per bucket**
   (hot-bucket/skew guard: degenerate buckets chain consecutive sorted
   members instead of emitting O(n²) pairs);
4. exact Jaccard verification of candidate pairs (``map_batches``);
5. union-find over verified edges on the driver — the edge list is small
   after dedup+verification (fallback documented: iterative min-label
   propagation via groupby if it ever isn't);
6. canonical map ``surface → IRI``: a cluster containing a gazetteer alias
   resolves to that entity (min entity id for determinism); an all-unknown
   cluster mints a stable slug IRI. The map is ``ray.put`` once and read
   inside downstream actors (broadcast, never re-shipped per batch).

This recovers surfaces deliberately absent from the gazetteer (typo /
spacing variants) onto the right canonical entity — the MinHash-LSH +
union-find canonicalization mandated by the north star.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from collections import defaultdict

import numpy as np
import pyarrow as pa

from ..corpus import ENTITY_NS, entity_iri

_NORM_RE = re.compile(r"[^a-z0-9]+")
_MERSENNE = np.uint64((1 << 61) - 1)


def normalize_surface(s: str) -> str:
    return _NORM_RE.sub("", s.casefold())


def shingles(s: str, k: int = 3) -> set:
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


class MinHashSignatures:
    """Actor-pool stage: surface → LSH bucket rows.

    Permutation parameters are sampled once per actor in ``__init__`` from a
    fixed seed (identical across actors ⇒ identical signatures everywhere).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)

    def signature(self, norm: str) -> np.ndarray:
        sh = shingles(norm)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        x = np.fromiter(
            (zlib.crc32(s.encode("utf-8")) for s in sorted(sh)),
            dtype=np.uint64,
            count=len(sh),
        )
        # (P, S) permuted hashes → min over shingles, vectorized
        h = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        out_surface, out_band_id, out_band_hash = [], [], []
        for s in surfaces:
            sig = self.signature(normalize_surface(s))
            for b in range(self.bands):
                band = sig[b * self.rows : (b + 1) * self.rows]
                bh = hashlib.blake2b(band.tobytes(), digest_size=8).digest()
                out_surface.append(s)
                out_band_id.append(b)
                out_band_hash.append(int.from_bytes(bh, "big") >> 1)
        return pa.table(
            {
                "surface": pa.array(out_surface, pa.string()),
                "band_id": pa.array(out_band_id, pa.int32()),
                "band_hash": pa.array(out_band_hash, pa.int64()),
            }
        )


# Task-mode variant (per-worker memoized signer; see stages/link.py note)
_SIGNER_CACHE: dict = {}


def minhash_signatures_batch(batch: pa.Table, num_perm: int = 64,
                             bands: int = 16, seed: int = 7) -> pa.Table:
    key = (num_perm, bands, seed)
    signer = _SIGNER_CACHE.get(key)
    if signer is None:
        signer = MinHashSignatures(num_perm=num_perm, bands=bands, seed=seed)
        _SIGNER_CACHE[key] = signer
    return signer(batch)


def bucket_pairs(group, max_pairs_per_bucket: int = 1024):
    """Candidate pairs for every LSH bucket hashed into one bounded
    partition (pandas group in, frame out). The group here is NOT one
    bucket: bucket cardinality ≈ vocabulary × bands and paying Ray's
    per-group overhead for each (mostly singleton) bucket dominates the
    whole build — so buckets are hashed into a fixed number of partitions
    and this fn walks the multi-member buckets inside one partition.
    Hot buckets degrade to a sorted chain — union-find closes
    transitivity, so a chain suffices to merge a genuinely-similar
    cluster while bounding a degenerate bucket to O(n) pairs (skew
    guard)."""
    import pandas as pd

    multi = group[group.duplicated(subset=["band_id", "band_hash"], keep=False)]
    s1_out: list = []
    s2_out: list = []
    for _, bucket in multi.groupby(["band_id", "band_hash"], sort=False):
        surfaces = sorted(set(bucket["surface"]))
        n = len(surfaces)
        if n < 2:
            continue
        if n * (n - 1) // 2 <= max_pairs_per_bucket:
            for i in range(n):
                s1_out.extend(surfaces[i] for _ in range(n - 1 - i))
                s2_out.extend(surfaces[i + 1 :])
        else:
            s1_out.extend(surfaces[:-1])
            s2_out.extend(surfaces[1:])
    return pd.DataFrame({"s1": s1_out, "s2": s2_out})


def verify_pairs(batch: pa.Table, threshold: float) -> pa.Table:
    s1 = batch["s1"].to_pylist()
    s2 = batch["s2"].to_pylist()
    keep = [
        jaccard(normalize_surface(a), normalize_surface(b)) >= threshold
        for a, b in zip(s1, s2)
    ]
    return batch.filter(pa.array(keep, pa.bool_()))


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic orientation: smaller root wins
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo

    def clusters(self) -> dict:
        out = defaultdict(list)
        for x in self.parent:
            out[self.find(x)].append(x)
        return {k: sorted(v) for k, v in out.items()}


def canonical_map_from_edges(edges, surfaces, alias_to_eid: dict) -> dict:
    """Union-find over verified edges → ``{surface: canonical IRI}``."""
    uf = UnionFind()
    for s in surfaces:
        uf.find(s)
    for a, b in edges:
        uf.union(a, b)
    # surfaces sharing a normalized form merge unconditionally (exact edges)
    by_norm = defaultdict(list)
    for s in surfaces:
        by_norm[normalize_surface(s)].append(s)
    for group in by_norm.values():
        for other in group[1:]:
            uf.union(group[0], other)
    out = {}
    for members in uf.clusters().values():
        eids = sorted(alias_to_eid[m] for m in members if m in alias_to_eid)
        if eids:
            iri = entity_iri(eids[0])
        else:
            from .link import surface_slug

            iri = ENTITY_NS + surface_slug(members[0])
        for m in members:
            out[m] = iri
    return out


def build_canonical_map(
    raw_ds,
    gazetteer: dict,
    *,
    threshold: float = 0.45,
    num_perm: int = 64,
    bands: int = 16,
    batch_size: int = 4096,
    extra_surfaces=None,
    surf_ds=None,
) -> dict:
    """Distributed canonicalization over a raw nested-triples Dataset.

    Returns the (small) ``surface → IRI`` dict, ready for ``ray.put``.
    The shuffles here run over the **surface vocabulary** (≪ corpus size);
    corpus-scale data is touched only by the first ``map_batches``.

    ``extra_surfaces``: additional vocabulary to cluster alongside the
    corpus surfaces (incremental builds pass the existing map's keys so
    new variants land in the clusters of the surfaces they vary).

    ``surf_ds``: optional pre-materialized distinct-surface Dataset
    (``canonmap.distinct_surfaces`` — must include the alias vocabulary;
    incompatible with ``extra_surfaces``). Skips the corpus scan; the
    resulting map is identical regardless of surface ORDER (clusters are
    an order-free partition, IRIs derive from sorted members)."""
    import ray.data as rd

    def surfaces_of(batch: pa.Table) -> pa.Table:
        seen = set()
        for trips in batch["triples"].to_pylist():
            for t in trips:
                seen.add(t["subj_surface"])
                if not t["obj_is_literal"]:
                    seen.add(t["obj_surface"])
        return pa.table({"surface": pa.array(sorted(seen), pa.string())})

    if surf_ds is not None and extra_surfaces:
        raise ValueError("surf_ds and extra_surfaces are exclusive")
    if surf_ds is None:
        vocab = sorted(gazetteer["alias_to_eid"])
        if extra_surfaces:
            vocab = sorted(set(vocab) | set(extra_surfaces))
        alias_tbl = pa.table({"surface": pa.array(vocab, pa.string())})
        surf_ds = (
            raw_ds.map_batches(surfaces_of, batch_format="pyarrow")
            .union(rd.from_arrow(alias_tbl))
            .groupby("surface")
            .count()
            .select_columns(["surface"])
            .materialize()  # vocabulary-scale (small); consumed twice
            # below — without this the corpus-scale surfaces_of pass
            # would re-execute
        )
    bucket_ds = surf_ds.map_batches(
        minhash_signatures_batch,
        fn_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    import pyarrow.compute as pc

    num_bucket_partitions = 64

    def add_pid(batch: pa.Table) -> pa.Table:
        key = pc.add(batch["band_hash"], batch["band_id"].cast(pa.int64()))
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_bucket_partitions, pa.int64())),
                pa.scalar(num_bucket_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("partition_id", pid)

    pair_ds = (
        bucket_ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    edge_ds = pair_ds.map_batches(
        verify_pairs, fn_kwargs={"threshold": threshold}, batch_format="pyarrow"
    )
    # edges are tiny post-verification; driver-side union-find is the
    # documented small-side reduce (fallback: label propagation rounds).
    edges = [(r["s1"], r["s2"]) for r in edge_ds.take_all()]
    surfaces = [r["surface"] for r in surf_ds.take_all()]
    return canonical_map_from_edges(edges, surfaces, gazetteer["alias_to_eid"])


def extend_canonical_map(old_map: dict, raw_ds, gazetteer: dict, **kw) -> dict:
    """Grow an existing ``surface → IRI`` map with an incremental batch's
    vocabulary WITHOUT moving any existing assignment.

    Stability contract (what makes incremental builds digest-compatible
    with the store they append to): every surface already in ``old_map``
    keeps exactly its old IRI — even if the new batch's variants would
    merge two old clusters, the old split stands (retroactive merges
    would rewrite history the log has already committed, the same reason
    git never rewrites reachable commits). A NEW surface that clusters
    with old surfaces adopts the lexicographically smallest of their
    IRIs; a genuinely new cluster keeps its freshly derived canonical.

    The clustering itself is the full distributed pass over (new corpus
    surfaces ∪ old vocabulary) — vocabulary-scale, like the map build.
    """
    fresh = build_canonical_map(
        raw_ds, gazetteer, extra_surfaces=list(old_map), **kw
    )
    clusters: dict = {}
    for s, c in fresh.items():
        clusters.setdefault(c, []).append(s)
    out = dict(old_map)
    for c, members in clusters.items():
        olds = sorted(old_map[m] for m in members if m in old_map)
        target = olds[0] if olds else c
        for m in members:
            if m not in out:
                out[m] = target
    return out
