"""Deduplication family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Patterns (scale-first):

- **exact**: content hash inside ``map_batches`` (vectorized-ish hashing)
  → ``groupby(hash)`` keep-min — hash-partition + per-group first; the
  shuffle carries only ``(hash, doc_id)``, never the text.
- **MinHash-LSH**: word-shingle signatures per batch → explode to band
  buckets → band-key groupby → candidate pairs (hot-bucket capped) →
  exact-Jaccard verify → connected components. Same machinery as entity
  canonicalization (``stages/canonicalize.py``) at document granularity.
- **SimHash**: 64-bit fingerprint via hashed-token sign aggregation
  (numpy vectorized per doc); near-dup candidates = equal 16-bit chunk
  (Hamming ≤ 3 guaranteed caught by pigeonhole with 4 chunks).
- **embedding cosine**: random-hyperplane LSH buckets → within-bucket
  pairwise cosine (numpy matmul) → threshold.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.canonicalize import UnionFind

# ----------------------------------------------------------------- exact ----


def _text_md5_batch(batch: pa.Table) -> pa.Table:
    h = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {"doc_id": batch["doc_id"], "text_md5": pa.array(h, pa.string())}
    )


def exact_dedup(docs_ds):
    """One row per distinct content: (doc_id=min id, n_dupes)."""
    from ray.data.aggregate import Count, Min

    return (
        docs_ds.map_batches(_text_md5_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dupes"))
        .select_columns(["doc_id", "n_dupes"])
    )


# ------------------------------------------------------------- minhash ------


def word_shingles(text: str, k: int = 3):
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


class DocMinHash:
    """Actor-pool stage: doc → (band_id, band_hash, doc_id) bucket rows.

    Per-batch costs are bounded: shingle CRCs are memoized per worker
    (templated web text repeats heavily), and band hashes are a
    splitmix-style numpy fold over the signature matrix — one vectorized
    pass per batch instead of a Python ``blake2b`` per (doc, band)."""

    def __init__(self, num_perm: int = 128, bands: int = 32, seed: int = 11):
        rng = np.random.default_rng(seed)
        m = np.uint64((1 << 61) - 1)
        self.m = m
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.a = rng.integers(1, int(m), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(m), size=num_perm, dtype=np.uint64)
        self._shingle_cache: dict = {}

    def _shingle_hashes(self, sh) -> np.ndarray:
        cache = self._shingle_cache
        out = np.empty(len(sh), dtype=np.uint64)
        for i, s in enumerate(sh):
            v = cache.get(s)
            if v is None:
                v = zlib.crc32(s.encode("utf-8"))
                if len(cache) < 2_000_000:  # per-worker bound
                    cache[s] = v
            out[i] = v
        return out

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        x = self._shingle_hashes(list(sh))  # order-free: min() commutes
        return ((self.a[:, None] * x[None, :] + self.b[:, None]) % self.m).min(axis=1)

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(D, num_perm) signatures → (D, bands) nonnegative int64 band
        keys (splitmix64-style avalanche, fully vectorized)."""
        chunks = sigs.reshape(len(sigs), self.bands, self.rows)
        c1 = np.uint64(0xBF58476D1CE4E5B9)
        c2 = np.uint64(0x94D049BB133111EB)
        h = np.full((len(sigs), self.bands), np.uint64(0x9E3779B97F4A7C15))
        for r in range(self.rows):
            h = (h ^ chunks[:, :, r]) * c1
            h ^= h >> np.uint64(30)
            h *= c2
            h ^= h >> np.uint64(31)
        return (h >> np.uint64(1)).view(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, text in enumerate(texts):
            sigs[i] = self.signature(text or "")
        bh = self.band_hashes(sigs)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), len(texts)),
                    pa.int32(),
                ),
                "band_hash": pa.array(bh.reshape(-1), pa.int64()),
            }
        )


def _bucket_pairs_in_partition(group: pd.DataFrame, cap: int = 256) -> pd.DataFrame:
    """Emit candidate pairs for EVERY band bucket hashed into this
    partition. One ``map_groups`` call handles thousands of buckets:
    singleton buckets (the vast majority) are dropped vectorized, and the
    per-bucket pair loop only ever sees the survivors. Hot buckets are
    chained, not exploded (skew guard; transitivity restored by
    union-find downstream)."""
    multi = group[group.duplicated(subset=["band_id", "band_hash"], keep=False)]
    a_out: list = []
    b_out: list = []
    for _, bucket in multi.groupby(["band_id", "band_hash"], sort=False):
        ids = sorted(set(bucket["doc_id"]))
        if len(ids) < 2:
            continue
        if len(ids) * (len(ids) - 1) // 2 <= cap:
            for i in range(len(ids)):
                a_out.extend(ids[i] for _ in range(len(ids) - 1 - i))
                b_out.extend(ids[i + 1 :])
        else:  # hot bucket: chain
            a_out.extend(ids[:-1])
            b_out.extend(ids[1:])
    return pd.DataFrame({"a": a_out, "b": b_out}).astype("int64")


# task-mode stage state, memoized once per worker process (see
# stages/link.py for the pattern rationale: these setups are cheap, so
# shared-pool workers beat paying an actor spawn per operator call)
_STAGE_CACHE: dict = {}


def _cached(cls, *args):
    key = (cls.__name__, args)
    obj = _STAGE_CACHE.get(key)
    if obj is None:
        obj = cls(*args)
        _STAGE_CACHE[key] = obj
    return obj


def doc_minhash_batch(batch: pa.Table, num_perm: int = 128, bands: int = 32,
                      seed: int = 11) -> pa.Table:
    return _cached(DocMinHash, num_perm, bands, seed)(batch)


def doc_simhash_batch(batch: pa.Table) -> pa.Table:
    return _cached(DocSimHash)(batch)


def hyperplane_lsh_batch(batch: pa.Table, dim: int = 64, n_planes: int = 12,
                         seed: int = 5) -> pa.Table:
    return _cached(HyperplaneLSH, dim, n_planes, seed)(batch)


def minhash_candidate_pairs(docs_ds, *, num_perm=128, bands=32, batch_size=2048,
                            num_partitions=64, distinct=True):
    """Distinct candidate near-dup id pairs from LSH banding.
    ``distinct=False`` skips the final pair-dedup shuffle — correct when
    the consumer already folds duplicate ``(a, b)`` rows (the join-verify
    path groups by pair identity anyway), saving one all-to-all.

    The shuffle key is ``(band_hash + band_id) % num_partitions``, NOT
    the raw bucket key: bucket cardinality ≈ corpus × bands (mostly
    singletons), and a ``map_groups`` per bucket would pay per-group
    overhead millions of times at scale. Bounded partitions keep the
    group count fixed while all rows of any bucket still co-locate
    (``band_hash`` is itself a uniform blake2b-derived value, so plain
    modulo distributes evenly)."""
    import pyarrow.compute as pc

    buckets = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        doc_minhash_batch,
        fn_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    def bucket_partition(batch: pa.Table) -> pa.Table:
        key = pc.add(batch["band_hash"], batch["band_id"].cast(pa.int64()))
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("partition_id", pid)

    pairs = (
        buckets.map_batches(bucket_partition, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(_bucket_pairs_in_partition, batch_format="pandas")
    )
    if not distinct:
        return pairs
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


def jaccard_docs(t1: str, t2: str, k: int = 3) -> float:
    s1, s2 = word_shingles(t1, k), word_shingles(t2, k)
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


def ngram_jaccard_pairs(docs_ds, *, threshold: float = 0.5, k: int = 3,
                        verify: str = "join", **kw):
    """Verified near-dup pairs ``(a, b, jaccard)``: LSH candidates
    exact-checked with word-``k``-gram Jaccard ≥ ``threshold``.
    ``jaccard`` is rounded to 6 decimals for hash-stable comparison.

    ``verify`` picks how candidate pairs are joined back to their texts:

    - ``"join"`` (default) — the scale path: an explicit co-partition
      join of the pair list against the docs table; nothing corpus-sized
      ever lands on the driver or in a single broadcast object; the
      exchanges carry only candidate pairs plus the matched texts.
    - ``"broadcast"`` — id→text dict ``ray.put`` once, read per actor.
      Opt-in fast path for corpora whose text fits comfortably in one
      object (small side of a broadcast join).
    """
    if verify == "join":
        # duplicate (a, b) candidates fold inside the verify's pair-identity
        # grouping, so the candidate distinct shuffle is skipped
        cand = minhash_candidate_pairs(docs_ds, distinct=False, **kw)
        return _verify_pairs_via_shuffle(cand, docs_ds, threshold, k)
    cand = minhash_candidate_pairs(docs_ds, **kw)

    import ray

    texts = {}
    for b in docs_ds.select_columns(["doc_id", "text"]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        texts.update(zip(b["doc_id"].to_pylist(), b["text"].to_pylist()))
    texts_ref = ray.put(texts)

    def verify_jaccard_batch(batch: pa.Table, texts_ref=None,
                             threshold: float = 0.5, k: int = 3) -> pa.Table:
        texts = _STAGE_CACHE.get(("texts", texts_ref))
        if texts is None:
            texts = ray.get(texts_ref)
            _STAGE_CACHE.clear()
            _STAGE_CACHE[("texts", texts_ref)] = texts
        a_out, b_out, j_out = [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            j = jaccard_docs(texts.get(a) or "", texts.get(b) or "", k)
            if j >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(j, 6))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    return cand.map_batches(
        verify_jaccard_batch,
        fn_kwargs={"texts_ref": texts_ref, "threshold": threshold, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
    )


def _verify_pairs_via_shuffle(cand, docs_ds, threshold: float, k: int,
                              num_partitions: int = 32):
    """Scale path for pair verification: an explicit two-shuffle
    co-partition join, with nothing corpus-sized on the driver or in a
    broadcast object.

    Shuffle 1 co-locates each candidate-pair *side* with its document
    text (union of doc rows and exploded pair-side rows, hash-partitioned
    on ``doc_id``); shuffle 2 re-keys the text-attached sides on the pair
    identity and verifies Jaccard where both sides meet. Partitioning
    assumption: a partition's share of the docs table fits a worker's
    heap (same knob as every hash join: raise ``num_partitions``)."""

    def doc_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["doc_id"],
                "a": pa.array([-1] * n, pa.int64()),
                "b": pa.array([-1] * n, pa.int64()),
                "text": batch["text"],
            }
        )

    def pair_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        return pa.table(
            {
                "key": pa.array(a + b, pa.int64()),
                "a": pa.array(a + a, pa.int64()),
                "b": pa.array(b + b, pa.int64()),
                "text": pa.array([None] * (2 * len(a)), pa.string()),
            }
        )

    def mod_partition(batch: pa.Table, col: str) -> pa.Table:
        import pyarrow.compute as pc

        key = batch[col]
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("partition_id", pid)

    def attach_text(group: pd.DataFrame) -> pd.DataFrame:
        docs = group[group["a"] < 0]
        sides = group[group["a"] >= 0]
        texts = dict(zip(docs["key"], docs["text"]))
        out = sides.copy()
        out["text"] = out["key"].map(texts)
        return out[["key", "a", "b", "text"]]

    def verify_group(group: pd.DataFrame, threshold: float, k: int) -> pd.DataFrame:
        a_out, b_out, j_out = [], [], []
        for (a, b), sides in group.groupby(["a", "b"], sort=False):
            texts = dict(zip(sides["key"], sides["text"]))
            j = jaccard_docs(texts.get(a) or "", texts.get(b) or "", k)
            if j >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(j, 6))
        return pd.DataFrame({"a": a_out, "b": b_out, "jaccard": j_out}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )

    sides = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(doc_rows, batch_format="pyarrow")
        .union(cand.map_batches(pair_rows, batch_format="pyarrow"))
        .map_batches(mod_partition, fn_kwargs={"col": "key"}, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(attach_text, batch_format="pandas")
    )
    return (
        sides.map_batches(mod_partition, fn_kwargs={"col": "a"}, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(
            lambda g: verify_group(g, threshold, k), batch_format="pandas"
        )
    )


def label_propagation_components(edges_ds, nodes_ds, *, max_iters: int | None = None,
                                 num_partitions: int = 32):
    """Connected components fully on Ray Data: iterative min-label
    propagation — the scale fallback when the verified edge list is too
    large for a driver-side union-find (SURVEY §7.4).

    Per iteration: (1) co-partition label rows with symmetric edge rows
    on the source node and emit each node's current label to its
    neighbors; (2) ``groupby(node).min`` folds messages + self-label into
    the new labels. Labels only ever decrease, so the global label sum is
    a strictly decreasing convergence witness — no changed-flag join
    needed, and the loop terminates in ≤ diameter iterations.

    ``max_iters=None`` (default) iterates until the witness stabilizes —
    the only way to guarantee correct components: the skew guard in
    :func:`_bucket_pairs_in_partition` deliberately chains hot buckets,
    so long-diameter path components are *expected*, not pathological.
    Passing a finite ``max_iters`` raises ``RuntimeError`` if the cap is
    hit before convergence rather than silently returning unmerged
    components."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        return pa.table(
            {
                "src": pa.array(a + b, pa.int64()),
                "dst": pa.array(b + a, pa.int64()),
            }
        )

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()
    labels = nodes_ds.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow",
    ).materialize()

    def mod_pid(batch: pa.Table, col: str) -> pa.Table:
        key = batch[col]
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("lp_pid", pid)

    def label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["node"],
                "dst": pa.array([-1] * n, pa.int64()),
                "label": batch["label"],
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["src"],
                "dst": batch["dst"],
                "label": pa.array([-1] * n, pa.int64()),
            }
        )

    def send_messages(group: pd.DataFrame) -> pd.DataFrame:
        lab = group[group["dst"] < 0]
        edg = group[group["dst"] >= 0]
        lookup = dict(zip(lab["key"], lab["label"]))
        out_node = list(lab["key"])          # self-message keeps the label
        out_label = list(lab["label"])
        out_node.extend(edg["dst"])          # neighbor messages
        out_label.extend(edg["key"].map(lookup))
        return pd.DataFrame({"node": out_node, "cand": out_label}).dropna().astype(
            {"node": "int64", "cand": "int64"}
        )

    prev_sum = None
    it = 0
    while True:
        msgs = (
            labels.map_batches(label_rows, batch_format="pyarrow")
            .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
            .map_batches(mod_pid, fn_kwargs={"col": "key"}, batch_format="pyarrow")
            .groupby("lp_pid")
            .map_groups(send_messages, batch_format="pandas")
        )
        labels = (
            msgs.groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if s == prev_sum:
            return labels
        prev_sum = s
        it += 1
        if max_iters is not None and it >= max_iters:
            raise RuntimeError(
                f"label propagation did not converge within max_iters={max_iters}; "
                "components would be unmerged — raise the cap or pass max_iters=None"
            )


def minhash_dedup_clusters(docs_ds, *, threshold: float = 0.7,
                           verify: str = "join",
                           components: str = "auto",
                           max_driver_edges: int = 2_000_000, **kw):
    """(doc_id, cluster_id=min doc_id of its near-dup component), as a
    streaming Dataset.

    ``components`` picks the connected-components reduce over the
    verified edges (LSH candidates + exact Jaccard, see
    :func:`ngram_jaccard_pairs`):

    - ``"auto"`` (default) — materialize the verified edge list (tiny
      relative to the corpus: only pairs that PASSED exact-Jaccard
      verification), count it, and pick ``"unionfind"`` when it is under
      ``max_driver_edges`` else ``"labelprop"``. The driver never holds
      anything corpus-sized either way — only actual near-dup edges.
    - ``"unionfind"`` — driver-side union-find over the edge list. Only
      the resulting component map (docs that HAVE a near-dup) is
      broadcast; cluster assignment streams over the corpus ids.
    - ``"labelprop"`` — fully distributed iterative min-label
      propagation (:func:`label_propagation_components`); the scale
      fallback when even the edge list outgrows the driver.
    """
    import ray

    edge_ds = ngram_jaccard_pairs(docs_ds, threshold=threshold, verify=verify, **kw)
    if components == "auto":
        edge_ds = edge_ds.materialize()
        components = (
            "unionfind" if edge_ds.count() <= max_driver_edges else "labelprop"
        )
    if components == "labelprop":
        nodes = docs_ds.select_columns(["doc_id"]).map_batches(
            lambda b: pa.table({"node": b["doc_id"]}), batch_format="pyarrow"
        )
        labels = label_propagation_components(edge_ds, nodes)
        return labels.map_batches(
            lambda b: pa.table({"doc_id": b["node"], "cluster_id": b["label"]}),
            batch_format="pyarrow",
        )

    edges = edge_ds.take_all()
    uf = UnionFind()
    for e in edges:
        uf.union(e["a"], e["b"])
    # union orientation is "smaller root wins" ⇒ root == min(component)
    cluster_map = {x: uf.find(x) for x in uf.parent}
    map_ref = ray.put(cluster_map)

    def assign_cluster_batch(batch: pa.Table, map_ref=None) -> pa.Table:
        cmap = _STAGE_CACHE.get(("cmap", map_ref))
        if cmap is None:
            cmap = ray.get(map_ref)
            _STAGE_CACHE.clear()
            _STAGE_CACHE[("cmap", map_ref)] = cmap
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    [cmap.get(i, i) for i in ids], pa.int64()
                ),
            }
        )

    return docs_ds.select_columns(["doc_id"]).map_batches(
        assign_cluster_batch,
        fn_kwargs={"map_ref": map_ref},
        batch_format="pyarrow",
        batch_size=8192,
    )


def dedup_documents(docs_ds, *, threshold: float = 0.7, **kw):
    """The end-user dedup surface: the documents Dataset with near-dup
    rows REMOVED, keeping each cluster's min-id representative. Streams:
    the cluster map from :func:`minhash_dedup_clusters` flows into a
    co-partitioned semi-join against the docs — the docs table is never
    collected anywhere."""
    import pyarrow.compute as pc

    clusters = minhash_dedup_clusters(docs_ds, threshold=threshold, **kw)
    keep = clusters.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"].filter(
                pc.equal(b["doc_id"], b["cluster_id"]))}
        ),
        batch_format="pyarrow",
    )
    # broadcast-free keep-set join: keep ids and docs co-partition on
    # doc_id; each partition emits its docs whose id is in its keep set
    import pandas as pd

    num_partitions = 32

    def mod_pid(batch: pa.Table, col: str) -> pa.Table:
        key = batch[col]
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("dd_pid", pid)

    def keep_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array([None] * n, pa.string()),
                "is_keep": pa.array([True] * n, pa.bool_()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "is_keep": pa.array([False] * n, pa.bool_()),
            }
        )

    def semi_join(group: pd.DataFrame) -> pd.DataFrame:
        keep_ids = set(group.loc[group["is_keep"], "doc_id"])
        docs = group[~group["is_keep"]]
        out = docs[docs["doc_id"].isin(keep_ids)]
        return out[["doc_id", "text"]]

    return (
        keep.map_batches(keep_rows, batch_format="pyarrow")
        .union(
            docs_ds.select_columns(["doc_id", "text"]).map_batches(
                doc_rows, batch_format="pyarrow"
            )
        )
        .map_batches(mod_pid, fn_kwargs={"col": "doc_id"}, batch_format="pyarrow")
        .groupby("dd_pid")
        .map_groups(semi_join, batch_format="pandas")
    )


# -------------------------------------------------------------- simhash -----


class DocSimHash:
    """64-bit SimHash per document (token-hash sign aggregation).

    Vectorized over the whole batch: tokens are factorized so each
    *unique* token in the batch is blake2b-hashed exactly once (the only
    Python loop left, and it shrinks with cross-doc token overlap); bit
    expansion and the per-document ±1 vote fold are pure numpy
    (``reduceat`` over the token→doc run boundaries)."""

    def __init__(self) -> None:
        self.bits = 64
        self._shifts = np.arange(64, dtype=np.uint64)
        self._token_hash_cache: dict = {}

    def _hash_tokens(self, uniques) -> np.ndarray:
        cache = self._token_hash_cache
        out = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):
            h = cache.get(u)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(u.encode("utf-8"), digest_size=8).digest(), "big"
                )
                if len(cache) < 1_000_000:  # per-worker bound
                    cache[u] = h
            out[i] = h
        return out

    def simhash_batch(self, texts: list) -> np.ndarray:
        n = len(texts)
        toks_per_doc = [t.split() if t else [] for t in texts]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        total = int(lens.sum())
        sh = np.zeros(n, dtype=np.uint64)
        if total == 0:
            return sh
        flat = np.empty(total, dtype=object)
        pos = 0
        for toks in toks_per_doc:
            flat[pos : pos + len(toks)] = toks
            pos += len(toks)
        # NUL-safe factorize: pd.factorize folds tokens differing only
        # past \x00 through the truncating C-string table (CLAUDE.md)
        import pyarrow.compute as _pc

        enc = _pc.dictionary_encode(pa.array(flat, pa.string()))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = enc.dictionary.to_numpy(zero_copy_only=False)
        tok_hashes = self._hash_tokens(uniques)[codes]
        nonempty = np.flatnonzero(lens)
        ne_lens = lens[nonempty]
        ne_starts = np.concatenate(([0], np.cumsum(ne_lens)[:-1]))
        ne_ends = ne_starts + ne_lens
        n_docs = len(nonempty)
        ones = np.empty((n_docs, 64), dtype=np.int64)
        # Bit expansion via unpackbits (SIMD; a broadcast uint64 shift of
        # the same shape measures ~50× slower), processed in ~16k-token
        # blocks: the block's bit matrix stays ~4 MB, because this host
        # faults in large cold allocations pathologically slowly (a
        # monolithic (total, 64) matrix costs seconds on first touch).
        chunk_tokens = 16384
        di = 0
        while di < n_docs:
            dj = di + 1
            while dj < n_docs and ne_ends[dj] - ne_starts[di] <= chunk_tokens:
                dj += 1
            tok0, tok1 = int(ne_starts[di]), int(ne_ends[dj - 1])
            bits = np.unpackbits(
                tok_hashes[tok0:tok1].view(np.uint8).reshape(-1, 8),
                axis=1,
                bitorder="little",
            ).astype(np.int32)
            ones[di:dj] = np.add.reduceat(bits, ne_starts[di:dj] - tok0, axis=0)
            di = dj
        # majority vote: sum(±1) > 0  ⇔  2·ones > n_tokens
        sh[nonempty] = (
            (ones * 2 > ne_lens[:, None]).astype(np.uint64)
            << self._shifts[None, :]
        ).sum(axis=1)
        return sh

    def simhash(self, text: str) -> int:
        return int(self.simhash_batch([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = self.simhash_batch(batch["text"].to_pylist())
        out_chunks = {
            f"chunk{c}": pa.array(
                ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32),
                pa.int32(),
            )
            for c in range(4)
        }
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                # h - 2^63 (the storable int64 form) == flip the top bit
                "simhash": pa.array(
                    (sh ^ np.uint64(1 << 63)).view(np.int64), pa.int64()
                ),
                **out_chunks,
            }
        )


def simhash_signatures(docs_ds, batch_size: int = 2048):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        doc_simhash_batch, batch_format="pyarrow", batch_size=batch_size
    )


def hamming_near_pairs(sigs_ds, *, max_hamming: int = 3,
                       id_col: str = "doc_id", sig_col: str = "simhash"):
    """Near-dup pairs with Hamming(64-bit signature) ≤ ``max_hamming``,
    over any ``(id_col, sig_col)`` dataset — SimHash docs and audio
    fingerprints share this kernel. Candidates via the 4×16-bit-chunk
    pigeonhole (any pair within distance 3 shares a chunk); verified
    exactly. Returns ``(a, b, hamming)`` with ``a < b``."""

    def chunk_rows(batch: pa.Table) -> pa.Table:
        # explode each row into its 4 chunk-bucket rows, fully vectorized
        ids = np.repeat(batch[id_col].to_numpy(), 4)
        sig64 = batch[sig_col].to_numpy().astype(np.uint64, copy=False)
        hashes = np.repeat(sig64.view(np.int64), 4)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        chunks = ((sig64[:, None] >> shifts)
                  & np.uint64(0xFFFF)).astype(np.int64)  # (n, 4)
        keys = (np.arange(4, dtype=np.int64)[None, :] << 16) | chunks
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_key": pa.array(keys.reshape(-1), pa.int64()),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )

    def pairs_in_partition(group: pd.DataFrame) -> pd.DataFrame:
        """All chunk-key buckets hashed into one bounded partition;
        singleton buckets dropped vectorized (same group-count-explosion
        guard as :func:`_bucket_pairs_in_partition`)."""
        multi = group[group.duplicated(subset=["chunk_key"], keep=False)]
        out = []
        for _, bucket in multi.groupby("chunk_key", sort=False):
            rows = sorted(set(zip(bucket["doc_id"], bucket["simhash"])))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    h = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
                    if h <= max_hamming:
                        out.append((rows[i][0], rows[j][0], h))
        return pd.DataFrame(
            {
                "a": [p[0] for p in out],
                "b": [p[1] for p in out],
                "hamming": [p[2] for p in out],
            }
        ).astype("int64")

    def add_pid(batch: pa.Table, num_partitions: int = 64) -> pa.Table:
        import pyarrow.compute as pc

        key = batch["chunk_key"]
        pid = pc.subtract(
            key,
            pc.multiply(
                pc.divide(key, pa.scalar(num_partitions, pa.int64())),
                pa.scalar(num_partitions, pa.int64()),
            ),
        ).cast(pa.int32())
        return batch.append_column("partition_id", pid)

    pairs = (
        sigs_ds.map_batches(chunk_rows, batch_format="pyarrow")
        .map_batches(add_pid, batch_format="pyarrow")
        .groupby("partition_id")
        .map_groups(pairs_in_partition, batch_format="pandas")
    )
    from ray.data.aggregate import Min

    out = (
        pairs.groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )
    if id_col == "doc_id":
        return out
    return out.map_batches(
        lambda t: t.rename_columns([f"{id_col}_a", f"{id_col}_b", "hamming"]),
        batch_format="pyarrow",
    )


def simhash_near_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming``. Candidates
    via the 4×16-bit-chunk pigeonhole (any pair within distance 3 shares a
    chunk); verified exactly."""
    return hamming_near_pairs(
        simhash_signatures(docs_ds), max_hamming=max_hamming
    )


# ---------------------------------------------------- embedding cosine ------


class HyperplaneLSH:
    """Random-hyperplane bucket assignment for cosine near-dup / ANN.
    Plane matrix sampled once per actor from a fixed seed."""

    def __init__(self, dim: int = 64, n_planes: int = 12, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes) > 0
        return (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(
            axis=1
        ).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(self.bucket_of(vecs), pa.int64()),
                "embedding": batch["embedding"],
            }
        )


def embedding_near_pairs(emb_ds, *, threshold: float = 0.45, n_planes: int = 10,
                         dim: int = 64, bucket_cap: int = 2048):
    """Cosine near-dup pairs within hyperplane-LSH buckets (numpy matmul
    per bucket — vectorized; bucket sizes bounded by the plane count).
    Group format is pyarrow so the output schema survives empty buckets.

    Degenerate-corpus guard: a near-identical corpus collapses into ONE
    bucket, making the all-pairs matmul O(B²) in time and memory. Buckets
    larger than ``bucket_cap`` are processed as consecutive id-sorted
    chunks — all pairs WITHIN each chunk (exact), chunks linked by a
    one-row overlap — the same hot-bucket chaining
    :func:`_bucket_pairs_in_partition` uses: cross-chunk pairs are
    dropped, and dup-cluster transitivity is restored by the downstream
    components pass. Work becomes O(B·cap), peak memory O(cap²)."""
    if bucket_cap < 2:
        raise ValueError("bucket_cap must be >= 2 (a chunk needs a pair)")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids_all = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids_all)
        ids_all = ids_all[order]
        V_all = np.asarray(group["embedding"].to_pylist(),
                           dtype=np.float64)[order]
        norms = np.linalg.norm(V_all, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V_all = V_all / norms
        a_parts, b_parts, c_parts = [], [], []
        n = len(ids_all)
        # one-row overlap chains consecutive chunks; a pair needs BOTH
        # endpoints in a chunk, so a 1-row overlap can never emit the
        # same pair twice — no dedup pass is needed
        step = max(1, bucket_cap - 1)
        for start in range(0, max(n - 1, 1), step):
            ids = ids_all[start:start + bucket_cap]
            V = V_all[start:start + bucket_cap]
            sim = V @ V.T
            ii, jj = np.triu_indices(len(ids), k=1)
            keep = sim[ii, jj] >= threshold
            a_parts.append(ids[ii[keep]])
            b_parts.append(ids[jj[keep]])
            c_parts.append(np.round(sim[ii, jj][keep], 6))
        a = np.concatenate(a_parts) if a_parts else np.empty(0, np.int64)
        b = np.concatenate(b_parts) if b_parts else np.empty(0, np.int64)
        c = np.concatenate(c_parts) if c_parts else np.empty(0, np.float64)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "cosine": pa.array(c, pa.float64()),
            }
        )

    bucketed = emb_ds.map_batches(
        hyperplane_lsh_batch,
        fn_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow",
        batch_size=4096,
    )
    return bucketed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )
