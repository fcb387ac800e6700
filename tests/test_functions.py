"""Training-data operators: dedup family, similarity search, text
analysis, multimodal plumbing — semantic checks on planted ground truth."""

import numpy as np
import pyarrow as pa
import pytest

BASE_DOC = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def _docs_table():
    texts = [
        BASE_DOC,
        BASE_DOC,  # exact dup of 0
        BASE_DOC.replace("lazy", "sleepy"),  # near dup of 0
        "completely different content about distributed query engines and arrow",
        "another unrelated document mentioning parquet files and object stores",
    ]
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_docs_table())


def test_exact_dedup(docs_ds):
    from rdf_diff_store_ray.functions.dedup import exact_dedup

    out = {r["doc_id"]: r["n_dupes"] for r in exact_dedup(docs_ds).take_all()}
    assert out[0] == 2  # docs 0 and 1 identical, min id kept
    assert 1 not in out
    assert out[2] == 1 and out[3] == 1 and out[4] == 1


def test_minhash_dedup_clusters(docs_ds):
    from rdf_diff_store_ray.functions.dedup import minhash_dedup_clusters

    rows = minhash_dedup_clusters(docs_ds, threshold=0.5).take_all()
    cl = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert cl[0] == cl[1] == cl[2] == 0  # exact + near dup share a cluster
    assert cl[3] != 0 and cl[4] != 0 and cl[3] != cl[4]


def test_labelprop_components_match_unionfind(docs_ds):
    from rdf_diff_store_ray.functions.dedup import minhash_dedup_clusters

    def as_map(ds):
        return {r["doc_id"]: r["cluster_id"] for r in ds.take_all()}

    uf = as_map(minhash_dedup_clusters(docs_ds, threshold=0.5))
    lp = as_map(
        minhash_dedup_clusters(docs_ds, threshold=0.5, components="labelprop")
    )
    assert uf == lp
    assert lp[0] == lp[1] == lp[2] == 0


def test_ngram_jaccard_pairs_join_verify_matches_broadcast(docs_ds):
    from rdf_diff_store_ray.functions.dedup import ngram_jaccard_pairs

    def key(rows):
        return sorted((r["a"], r["b"], r["jaccard"]) for r in rows)

    bcast = key(ngram_jaccard_pairs(docs_ds, threshold=0.5).take_all())
    joined = key(
        ngram_jaccard_pairs(docs_ds, threshold=0.5, verify="join").take_all()
    )
    assert bcast == joined and len(bcast) > 0


def test_simhash_near_pairs(docs_ds):
    from rdf_diff_store_ray.functions.dedup import simhash_near_pairs

    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_near_pairs(docs_ds, max_hamming=8).take_all()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0  # identical → distance 0
    assert all(not ((a in (3, 4)) ^ (b in (3, 4))) for a, b in pairs), pairs


def test_jaccard_docs():
    from rdf_diff_store_ray.functions.dedup import jaccard_docs

    assert jaccard_docs(BASE_DOC, BASE_DOC) == 1.0
    assert jaccard_docs(BASE_DOC, "zebra") == 0.0
    j = jaccard_docs(BASE_DOC, BASE_DOC.replace("lazy", "sleepy"))
    assert 0.5 < j < 1.0


def test_embedding_near_pairs_planted(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.dedup import embedding_near_pairs

    rng = np.random.default_rng(3)
    V = rng.standard_normal((50, 64))
    V[7] = V[3] + rng.standard_normal(64) * 0.01  # planted near-dup pair
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.array([v.astype(np.float32).tolist() for v in V],
                                      pa.list_(pa.float32())),
            }
        )
    )
    pairs = [(r["a"], r["b"]) for r in embedding_near_pairs(emb, threshold=0.98).take_all()]
    assert (3, 7) in pairs
    assert len(pairs) <= 3  # no spurious merges of random vectors


def _random_embeddings(n=400, d=64, seed=11):
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, d))
    return V


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    V = _random_embeddings()
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(V)), pa.int64()),
                "embedding": pa.array([v.astype(np.float32).tolist() for v in V],
                                      pa.list_(pa.float32())),
            }
        )
    )


def test_brute_force_topk_matches_numpy(emb_ds, ray_session):
    from rdf_diff_store_ray.functions.similarity import brute_force_topk

    V = _random_embeddings().astype(np.float32).astype(np.float64)
    q = V[5:6]
    got = brute_force_topk(emb_ds, q, k=10)
    ids = got["vec_id"].to_pylist()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = Vn @ qn[0]
    want = [int(i) for _, i in sorted(zip(-sims, range(len(V))))[:10]]
    assert ids == want
    assert got["rank"].to_pylist() == list(range(1, 11))
    assert got["vec_id"].to_pylist()[0] == 5  # self is most similar


def test_lsh_topk_finds_planted_neighbor(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.similarity import lsh_topk

    V = _random_embeddings(n=300)
    V[42] = V[5] * 1.001  # planted: same direction as query
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(V)), pa.int64()),
                "embedding": pa.array([v.astype(np.float32).tolist() for v in V],
                                      pa.list_(pa.float32())),
            }
        )
    )
    out = lsh_topk(emb, V[5:6], k=5)
    top_ids = out["vec_id"].to_pylist()[:2]
    assert set(top_ids) == {5, 42}  # exact-direction matches always bucket together


def test_ngram_jaccard_pairs(docs_ds):
    from rdf_diff_store_ray.functions.dedup import ngram_jaccard_pairs

    rows = ngram_jaccard_pairs(docs_ds, threshold=0.5).take_all()
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in rows}
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0  # near dup
    assert all(not ((a in (3, 4)) ^ (b in (3, 4))) for a, b in pairs), pairs


def test_ivf_topk_recall_vs_brute_force(emb_ds, ray_session):
    from rdf_diff_store_ray.functions.similarity import brute_force_topk, ivf_topk

    V = _random_embeddings().astype(np.float32).astype(np.float64)
    q = V[5:6]
    exact = set(brute_force_topk(emb_ds, q, k=10)["vec_id"].to_pylist())
    approx = ivf_topk(emb_ds, q, k=10, n_clusters=8, nprobe=4)
    got = approx["vec_id"].to_pylist()
    assert got[0] == 5  # self always lands in the probed list
    assert len(set(got) & exact) >= 5  # recall@10 ≥ 0.5 with half the lists probed
    assert approx["rank"].to_pylist() == sorted(approx["rank"].to_pylist())


def test_ivf_topk_deterministic(emb_ds, ray_session):
    from rdf_diff_store_ray.functions.similarity import ivf_topk

    V = _random_embeddings().astype(np.float32).astype(np.float64)
    a = ivf_topk(emb_ds, V[7:8], k=5)
    b = ivf_topk(emb_ds, V[7:8], k=5)
    assert a.equals(b)


def test_quality_score_batch():
    from rdf_diff_store_ray.functions.text import quality_score_batch

    good = "the cat and the dog went to the market for a walk in the sun"
    bad = "@@@ ### !!! $$$ %%%"
    batch = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array([good, bad], pa.string())}
    )
    out = quality_score_batch(batch)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["quality_ok"] is True
    assert rows[2]["quality_ok"] is False
    assert rows[1]["n_stopwords"] >= 5
    assert rows[2]["n_alpha"] == 0
    assert rows[1]["n_bpe_tokens"] == rows[1]["n_tokens"]  # pure alpha words


def test_langid_profiles():
    from rdf_diff_store_ray.functions.text import LangId

    li = LangId()
    assert li.classify("the cat and the dog went to the market") == "en"
    assert li.classify("der Hund und die Katze sind nicht hier") == "de"
    assert li.classify("le chat est dans la maison pour la nuit") == "fr"
    assert li.classify("el perro y el gato es una familia") == "es"
    assert li.classify("det er ikke en katt på taket og på") == "no"
    assert li.classify("") == "und"
    assert li.classify("12345 67890") == "und"


def test_doc_stats_counts():
    from rdf_diff_store_ray.functions.text import doc_stats_batch

    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()),
         "text": pa.array(["ab c1, d!"], pa.string())}
    )
    r = doc_stats_batch(batch).to_pylist()[0]
    assert r["n_chars"] == 9
    assert r["n_tokens"] == 3
    assert r["n_digits"] == 1
    assert r["n_punct"] == 2  # ',' and '!'


def test_rolling_fingerprint_deterministic():
    from rdf_diff_store_ray.functions.text import rolling_fingerprint

    a = rolling_fingerprint("some document text " * 10)
    b = rolling_fingerprint("some document text " * 10)
    c = rolling_fingerprint("some document text " * 10 + "x")
    assert a == b != c


# ------------------------------------------------------------- multimodal ---
def test_multimodal_decode_plumbing(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.multimodal import (
        decode_features,
        synthetic_media_table,
    )

    media = rd.from_arrow(synthetic_media_table(n=10, h=24, w=32))
    out = decode_features(media).take_all()
    assert len(out) == 10
    assert all(r["height"] == 24 and r["width"] == 32 for r in out)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-5 for r in out)  # histogram sums to 1


def test_multimodal_resize(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.multimodal import (
        ResizeStage,
        decode_features,
        synthetic_media_table,
    )

    media = rd.from_arrow(synthetic_media_table(n=4, h=32, w=32))
    resized = media.map_batches(
        ResizeStage, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow", batch_size=2, concurrency=1,
    )
    out = decode_features(resized).take_all()
    assert all(r["height"] == 8 and r["width"] == 8 for r in out)


def test_multimodal_real_codec_routes_or_stubs():
    """jpeg/png decode goes through PIL when installed, else raises the
    clearly-marked environment stub — parametrized on availability."""
    from rdf_diff_store_ray.functions.multimodal import decode_payload, pil_available

    if pil_available():
        import io

        from PIL import Image
        import numpy as np

        buf = io.BytesIO()
        Image.fromarray(np.arange(64, dtype=np.uint8).reshape(8, 8)).save(
            buf, format="PNG"
        )
        arr = decode_payload("png", buf.getvalue())
        assert arr.shape == (8, 8)
    else:
        # jpeg is a vendored real codec now; webp remains the PIL stub
        import numpy as np

        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_payload("webp", b"RIFF....WEBP")
        from rdf_diff_store_ray.functions.jpeg import encode_jpeg

        arr = decode_payload(
            "jpeg", encode_jpeg(np.full((8, 8), 9, np.uint8)))
        assert arr.shape == (8, 8)
    with pytest.raises(NotImplementedError, match="not supported"):
        decode_payload("wav", b"RIFF")


def test_multimodal_corrupt_payload():
    from rdf_diff_store_ray.functions.multimodal import decode_payload

    with pytest.raises(ValueError, match="magic"):
        decode_payload("fake-v1", b"NOTFAKE123")


def test_multimodal_frame_sample_chain(ray_session):
    """video → frame-sample (flat-map actor stage) → per-frame decode
    features; deterministic fake codec, real Ray plumbing."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.multimodal import (
        decode_features,
        sample_frames,
        synthetic_video_table,
    )

    vids = rd.from_arrow(synthetic_video_table(6, n_frames=16, h=8, w=8))
    frames = sample_frames(vids, stride=4)
    feats = decode_features(frames, batch_size=16).take_all()
    # 6 videos × ceil(16/4) frames each
    assert len(feats) == 6 * 4
    assert {(r["media_id"], r["frame_id"]) for r in feats} == {
        (m, f) for m in range(6) for f in (0, 4, 8, 12)
    }
    assert all(len(r["features"]) == 16 for r in feats)
    # determinism: second run byte-equal
    feats2 = decode_features(sample_frames(vids, stride=4), batch_size=16).take_all()
    key = lambda r: (r["media_id"], r["frame_id"])
    assert sorted(feats, key=key) == sorted(feats2, key=key)


def test_multimodal_video_codec_stubbed():
    from rdf_diff_store_ray.functions.multimodal import decode_video_payload

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_video_payload("mp4", b"\x00\x00")


def test_approx_distinct_users_error_bound(ray_session):
    """HLL sketch estimate within ~3σ of the exact distinct count
    (σ ≈ 1.04/√m)."""
    import duckdb

    from rdf_diff_store_ray.pipelines.relational import approx_distinct_users

    sf = "/root/testdata/sf0.001"
    est = approx_distinct_users(sf)["approx_distinct_users"][0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 3 * 1.04 / (4096 ** 0.5), (est, exact)


def test_dedup_documents_removes_planted_dupes(docs_ds):
    """End-user dedup surface: planted near-dups collapse to one kept
    representative (the cluster min id); non-dup docs survive."""
    from rdf_diff_store_ray.functions.dedup import (
        dedup_documents,
        minhash_dedup_clusters,
    )

    clusters = {r["doc_id"]: r["cluster_id"]
                for r in minhash_dedup_clusters(docs_ds, threshold=0.5).take_all()}
    kept = sorted(r["doc_id"] for r in dedup_documents(docs_ds, threshold=0.5).take_all())
    want = sorted({cid for cid in clusters.values()})
    assert kept == want
    assert len(kept) < len(clusters)  # the fixture plants dupes


def test_embedding_near_pairs_degenerate_bucket_bounded(ray_session):
    """A near-identical corpus collapses into one LSH bucket; the chunked
    hot-bucket guard must keep work O(B*cap) and still connect every
    vector into one dup component via chunk overlap."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.dedup import embedding_near_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    V = base + rng.standard_normal((600, 64)) * 1e-4  # all near-identical
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(600), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in V],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    rows = embedding_near_pairs(emb, threshold=0.99, bucket_cap=128).take_all()
    # bounded: chained chunks emit ~ (B/cap)*cap^2/2 pairs, never B^2/2
    assert 0 < len(rows) < 600 * 599 // 2
    # connectivity: union-find over emitted pairs yields ONE component
    parent = list(range(600))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        parent[find(int(r["a"]))] = find(int(r["b"]))
    assert len({find(i) for i in range(600)}) == 1
    # no duplicate pairs from the overlap row
    pairs = [(r["a"], r["b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_repetition_stats_batch_edge_cases():
    from rdf_diff_store_ray.functions.text import repetition_stats_batch

    b = pa.table(
        {
            "doc_id": ["d1", "d2", "d3", "d4"],
            # d1: bigram tie 'a b' vs 'b a' -> lexicographically smallest
            # d2: single token, no bigram; d3: whitespace only; d4: token
            # tie between 'x' and 'y' -> 'x'
            "text": ["a b a b a", "solo", "   ", "x y x y"],
        }
    )
    out = repetition_stats_batch(b).to_pandas().set_index("doc_id")
    assert out.loc["d1", "n_tokens"] == 5
    assert out.loc["d1", "top_token"] == "a"
    assert out.loc["d1", "top_token_count"] == 3
    assert out.loc["d1", "top_bigram"] == "a b"
    assert out.loc["d1", "top_bigram_count"] == 2
    assert out.loc["d2", "n_tokens"] == 1
    assert out.loc["d2", "top_bigram"] is None
    assert out.loc["d2", "top_bigram_count"] == 0
    assert out.loc["d3", "n_tokens"] == 0
    assert out.loc["d3", "top_token"] is None
    assert out.loc["d4", "top_token"] == "x"
    assert out.loc["d4", "top_bigram"] == "x y"  # 2 hits beat 'y x' (1)
    assert out.loc["d4", "top_bigram_count"] == 2


# ------------------------------------------------ k-means / SemDeDup --------
def _blob_table(n_per=40, d=8, seed=7):
    """Three well-separated Gaussian blobs; returns (table, true_label)."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0] + [0.0] * (d - 1),
         [0.0] * (d - 1) + [10.0],
         [-10.0] + [0.0] * (d - 1)]
    )
    vecs, labels = [], []
    for li, c in enumerate(centers):
        vecs.append(c[None, :] + rng.normal(0, 0.3, size=(n_per, d)))
        labels.extend([li] * n_per)
    V = np.concatenate(vecs)
    t = pa.table(
        {"vec_id": pa.array(range(len(V)), pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in V],
                               pa.list_(pa.float64()))}
    )
    return t, np.asarray(labels)


def test_kmeans_recovers_planted_blobs(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.cluster import (kmeans_assign,
                                                      kmeans_fit)

    t, truth = _blob_table()
    ds = rd.from_arrow(t)
    cent = kmeans_fit(ds, 3, seed=0)
    assert cent.shape == (3, 8)
    rows = kmeans_assign(ds, cent).take_all()
    assign = np.empty(len(truth), dtype=np.int64)
    for r in rows:
        assign[r["vec_id"]] = r["cluster"]
    # each planted blob lands wholly in one distinct cluster
    mapped = {li: set(assign[truth == li]) for li in range(3)}
    assert all(len(s) == 1 for s in mapped.values())
    assert len(set().union(*mapped.values())) == 3
    # members sit close to their centroid
    assert all(r["dist"] < 2.0 for r in rows)


def test_kmeans_deterministic(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.cluster import kmeans_fit

    t, _ = _blob_table()
    c1 = kmeans_fit(rd.from_arrow(t), 3, seed=0)
    c2 = kmeans_fit(rd.from_arrow(t), 3, seed=0)
    np.testing.assert_array_equal(c1, c2)


def test_semantic_dedup_drops_planted_dupes(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.cluster import semantic_dedup

    t, _ = _blob_table()
    V = np.asarray([list(v) for v in t["embedding"].to_pylist()])
    n = len(V)
    # plant near-duplicates: ids n..n+4 are tiny perturbations of 0..4
    dup_src = np.arange(5)
    dups = V[dup_src] * 1.0001
    allV = np.concatenate([V, dups])
    ids = list(range(n + 5))
    ds = rd.from_arrow(pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in allV],
                               pa.list_(pa.float64()))}
    ))
    out = {r["vec_id"]: r for r in
           semantic_dedup(ds, k=3, threshold=0.999, seed=0).take_all()}
    assert len(out) == n + 5
    for i, src in enumerate(dup_src):
        r = out[n + i]
        assert not r["keep"]
        assert r["dup_of"] == src  # lowest-id representative
        assert out[src]["keep"]  # originals survive


def test_semantic_dedup_chunked_matches_unchunked(ray_session):
    """cluster_cap chunking must not change verdicts on sorted-id data
    where dup pairs are adjacent."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.cluster import semantic_dedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 6))
    # consecutive pairs (2i, 2i+1) are near-dupes
    V = np.repeat(base, 2, axis=0)
    V[1::2] *= 1.0001
    ds_t = pa.table(
        {"vec_id": pa.array(range(len(V)), pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in V],
                               pa.list_(pa.float64()))}
    )
    big = semantic_dedup(rd.from_arrow(ds_t), k=1, threshold=0.999,
                         seed=0).take_all()
    small = semantic_dedup(rd.from_arrow(ds_t), k=1, threshold=0.999,
                           seed=0, cluster_cap=8).take_all()
    as_map = lambda rows: {r["vec_id"]: (r["keep"], r["dup_of"])
                           for r in rows}
    assert as_map(big) == as_map(small)


# --------------------------------------------------- PII / decontam ---------
def test_pii_redact_planted(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import pii_redact

    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array([
             "write to alice@example.com or +1 (555) 123-4567 today",
             "host 192.168.0.1 holds ssn 123-45-6789",
             "nothing sensitive here",
         ])}
    ))
    out = pii_redact(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == "write to [EMAIL] or [PHONE] today"
    assert out.loc[0, "n_email"] == 1 and out.loc[0, "n_phone"] == 1
    assert out.loc[1, "clean_text"] == "host [IP] holds ssn [SSN]"
    assert out.loc[1, "n_ip"] == 1 and out.loc[1, "n_ssn"] == 1
    assert out.loc[2, "clean_text"] == "nothing sensitive here"
    assert int(out.loc[2, ["n_email", "n_ip", "n_ssn", "n_phone"]].sum()) == 0


def test_pii_redact_ssn_not_double_counted_as_phone():
    """Class order is part of the contract: SSN redacts before PHONE, so
    an SSN is never ALSO counted as a phone number."""
    from rdf_diff_store_ray.functions.text import pii_redact_batch

    b = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["ssn 123-45-6789 only"])})
    out = pii_redact_batch(b).to_pandas()
    assert out.loc[0, "n_ssn"] == 1
    assert out.loc[0, "n_phone"] == 0
    assert out.loc[0, "clean_text"] == "ssn [SSN] only"


def test_decontaminate_flags_planted_overlap(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from rdf_diff_store_ray.pipelines.queries import decontaminate

    texts = (
        ["alpha beta gamma delta"] * 2          # bench docs 0-1
        + ["x y z alpha beta gamma tail",       # contains bench 3-gram
           "totally clean document words"]      # clean
    )
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * 4),
                  "source": pa.array(["s"] * 4),
                  "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        tmp_path / "documents.parquet",
    )
    out = decontaminate(str(tmp_path), n_bench=2, plen=3).to_pandas()
    out = out.set_index("doc_id")
    assert bool(out.loc[2, "contaminated"]) and out.loc[2, "n_hits"] == 1
    assert not bool(out.loc[3, "contaminated"]) and out.loc[3, "n_hits"] == 0
    assert set(out.index) == {2, 3}  # bench docs excluded


def test_fineweb_filter_rules_and_priority():
    """Each rule fires on a planted doc; the FIRST failing rule wins."""
    import pyarrow as pa

    from rdf_diff_store_ray.functions.text import fineweb_filter_batch

    good = ("the cat and the dog ran to the house in the park and it was "
            "a fine day for all of them with sun and wind and more ") * 2
    docs = {
        "ok": good,
        "too_short": "the cat sat",
        "digit_heavy": ("the 123456 and 987654 of 55555 to 4444 in 333 "
                        "was 22 for 11 with 99 " * 4),
        "punct_heavy": ("the !!! and ??? of ;;; to ::: in ### was $$$ "
                        "for %%% with @@@ " * 4),
        "low_alpha": "the " + "1 2 3 4 5 6 7 8 9 0 " * 10,
        "few_stopwords": "lorem ipsum dolor sit amet " * 10,
        "word_len_high": ("the Pneumonoultramicroscopicsilicovolcanoconiosis"
                          "word and " + "Supercalifragilisticexpialidocious"
                          "antidisestablishmentarianism " * 20),
    }
    out = fineweb_filter_batch(
        pa.table({"doc_id": list(docs), "text": list(docs.values())})
    ).to_pandas().set_index("doc_id")
    assert bool(out.loc["ok", "keep"]) and out.loc["ok", "reason"] == ""
    for name in docs:
        if name != "ok":
            assert not out.loc[name, "keep"], name
    assert out.loc["too_short", "reason"] == "too_short"
    assert out.loc["few_stopwords", "reason"] == "few_stopwords"
    # digit_heavy doc is also stopword-poor at the margin, but
    # digit_heavy has priority in FILTER_RULES
    assert out.loc["digit_heavy", "reason"] == "digit_heavy"
    assert out.loc["punct_heavy", "reason"] == "punct_heavy"
    assert out.loc["low_alpha", "reason"] in ("digit_heavy", "low_alpha")
    assert out.loc["word_len_high", "reason"] == "word_len_high"


def test_line_dedup_matches_naive_and_handles_empty(ray_session):
    """Distributed two-pass line dedup == the naive in-memory scrub,
    including a fully-empty doc and a doc that loses every line."""
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import line_dedup

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "unique one\nBOILER\nkeep me",
                "BOILER\nother text\nFOOTER",
                "FOOTER\nBOILER",  # loses everything
                "",
                "solo doc only line",
            ],
        }
    )
    out = (
        line_dedup(rd.from_pandas(docs), min_dup=2)
        .to_pandas().set_index("doc_id")
    )
    c = Counter(ln for t in docs["text"] for ln in t.split("\n") if ln)
    dup = {ln for ln, n in c.items() if n >= 2}
    for _, r in docs.iterrows():
        want = "\n".join(
            ln for ln in r["text"].split("\n") if ln and ln not in dup
        )
        assert out.loc[r["doc_id"], "clean_text"] == want
    assert out.loc[3, "clean_text"] == "" and out.loc[3, "n_dropped"] == 2
    assert out.loc[4, "n_lines"] == 0


def test_line_dedup_corpus_finds_boilerplate(ray_session):
    """The KG pages corpus carries genuine cross-page boilerplate — the
    scrub must drop lines while keeping per-page accounting exact."""
    from rdf_diff_store_ray.pipelines.queries import line_dedup_corpus

    out = line_dedup_corpus("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 100
    assert (out["n_dropped"] > 0).any()
    assert (out["n_dropped"] <= out["n_lines"]).all()
    assert (out.loc[out["n_dropped"] == out["n_lines"], "clean_chars"] == 0).all()


def test_heavy_hitters_cms_bounds_and_recall(ray_session):
    """CMS estimates never underestimate, and at sf0.001 (hundreds of
    distinct tokens vs width 8192) the top-10 matches the exact count
    ranking exactly — deterministic, so asserted exactly."""
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import heavy_hitters

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = heavy_hitters(ds, k=10).to_pandas()
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    exact = docs["text"].str.findall(r"\S+").explode().value_counts()
    assert list(out["token"]) == list(exact.head(10).index)
    for _, r in out.iterrows():
        assert r["est_count"] >= exact[r["token"]]


def test_curate_corpus_composes_stages(ray_session):
    """The composed curation pipeline: every survivor passes the quality
    filter, per-language counts respect the cap, and the result is
    deterministic across runs."""
    import pyarrow as pa

    from rdf_diff_store_ray.functions.text import fineweb_filter_batch
    from rdf_diff_store_ray.pipelines.queries import curate_corpus

    out = curate_corpus("/root/testdata/sf0.001", per_lang=30).to_pandas()
    assert len(out) > 0
    assert (out.groupby("lang").size() <= 30).all()
    # survivors all pass the quality filter
    import pandas as pd

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    surv = docs[docs["doc_id"].isin(out["doc_id"])]
    verdict = fineweb_filter_batch(
        pa.Table.from_pandas(surv, preserve_index=False)
    ).to_pandas()
    assert verdict["keep"].all()
    # split assignment matches the train_val_split rule exactly
    import hashlib

    for did, split in zip(out["doc_id"], out["split"]):
        want = ("train" if hashlib.md5(f"split:{did}".encode())
                .hexdigest()[:8] < "e6666666" else "val")
        assert split == want
    assert set(out["split"]) <= {"train", "val"}
    # deterministic
    again = curate_corpus("/root/testdata/sf0.001", per_lang=30).to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_media_dedup_perceptual(ray_session):
    """aHash collapses perceptually identical payloads (1-pixel noise)
    into one group and keeps distinct images apart."""
    import pyarrow as pa
    import ray.data as rd

    from rdf_diff_store_ray.functions.multimodal import (
        encode_fake_image,
        media_dedup,
        synthetic_media_table,
    )

    base = encode_fake_image(7, 32, 32)
    # perturb ONE pixel by one level: below any mean-threshold flip
    noisy = bytearray(base)
    noisy[-1] = (noisy[-1] + 1) % 256
    distinct = encode_fake_image(8, 32, 32)
    media = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "media_type": pa.array(["image"] * 3, pa.string()),
            "codec": pa.array(["fake-v1"] * 3, pa.string()),
            "payload": pa.array([base, bytes(noisy), distinct],
                                pa.binary()),
        }
    )
    out = media_dedup(rd.from_arrow(media)).to_pandas() \
        .sort_values("media_id", ignore_index=True)
    assert out.loc[0, "keep"] and out.loc[0, "dup_of"] == -1
    assert not out.loc[1, "keep"] and out.loc[1, "dup_of"] == 1
    assert out.loc[2, "keep"]  # distinct content survives
    # determinism + self-dedup on a clean synthetic set: no collisions
    clean = media_dedup(
        rd.from_arrow(synthetic_media_table(n=64, h=32, w=32))
    ).to_pandas()
    assert clean["keep"].all()


def test_quantize_embeddings_roundtrip(emb_ds, ray_session):
    """int8 quantization: reconstruction error bounded by scale/2 per
    dimension, codes in range, ANN top-1 preserved on dequantized
    vectors."""
    from rdf_diff_store_ray.functions.similarity import (
        brute_force_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )

    codes_ds, params = quantize_embeddings(emb_ds)
    mins, scales = params
    codes = codes_ds.to_pandas().sort_values("vec_id", ignore_index=True)
    flat = np.stack(codes["codes"].to_numpy())
    assert flat.min() >= 0 and flat.max() <= 255
    back = dequantize_embeddings(codes_ds, params).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    V = _random_embeddings()
    R = np.stack(back["embedding"].to_numpy())
    err = np.abs(R - V)
    assert (err <= scales[None, :] / 2 + 1e-9).all()
    # ANN semantics survive quantization: self is still rank-1
    import ray.data as rd
    import pyarrow as pa_

    emb2 = rd.from_arrow(pa_.table({
        "vec_id": pa_.array(back["vec_id"].tolist(), pa_.int64()),
        "embedding": pa_.array([list(map(float, v)) for v in R],
                               pa_.list_(pa_.float32())),
    }))
    got = brute_force_topk(emb2, V[5:6], k=3)
    assert got["vec_id"].to_pylist()[0] == 5


# ---------------------------------------------------------------- BPE


def _naive_bpe(word_freqs: dict, n_merges: int):
    """Straight transcription of the Sennrich et al. (2016) pseudocode:
    recount every pair each iteration, merge the most frequent
    (ties: lexicographically smallest pair)."""
    from collections import Counter

    vocab = {tuple(w) + ("</w>",): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges, vocab


def test_bpe_learn_merges_matches_naive():
    import pandas as pd

    from rdf_diff_store_ray.functions.bpe import learn_merges

    word_freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
                  "new": 2, "wide": 1}
    wf = pd.DataFrame(
        {"word": list(word_freqs), "n": list(word_freqs.values())}
    )
    got = learn_merges(wf, 12)
    want, _ = _naive_bpe(word_freqs, 12)
    assert got == want


def test_bpe_train_and_encode_distributed(docs_ds):
    from collections import Counter

    from rdf_diff_store_ray.functions.bpe import (
        _PRETOK_RE, bpe_token_counts, bpe_tokens_per_doc, bpe_train,
        encode_word,
    )

    merges = bpe_train(docs_ds, n_merges=40, max_words=1000)
    merges2 = bpe_train(docs_ds, n_merges=40, max_words=1000)
    assert merges == merges2  # deterministic model

    # naive corpus-wide token counts from the same merges
    texts = _docs_table()["text"].to_pylist()
    ranks = {p: i for i, p in enumerate(merges)}
    want = Counter()
    total_words = 0
    for t in texts:
        for w in _PRETOK_RE.findall(t):
            total_words += 1
            for tok in encode_word(w, ranks):
                want[tok] += 1

    got_tbl = bpe_token_counts(docs_ds, merges).to_pandas()
    got = dict(zip(got_tbl["token"], got_tbl["n"]))
    assert got == dict(want)

    per_doc = bpe_tokens_per_doc(docs_ds, merges).to_pandas()
    assert per_doc["n_tokens"].sum() == sum(want.values())
    # every word emits >= 1 token, and identical docs tokenize identically
    m = dict(zip(per_doc["doc_id"], per_doc["n_tokens"]))
    assert m[0] == m[1] and m[0] >= len(_PRETOK_RE.findall(texts[0]))


def test_bpe_empty_corpus_raises(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import bpe_train

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    with pytest.raises(ValueError, match="empty"):
        bpe_train(empty, n_merges=5)


# ---------------------------------------------------------- span dedup


def test_span_dedup_plants_and_scrubs(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import span_dedup

    passage = " ".join(f"tok{i}" for i in range(30))  # 30-token dup span
    uniq = [
        " ".join(f"u{d}w{i}" for i in range(40)) for d in range(3)
    ]
    texts = [
        uniq[0] + " " + passage,
        passage + " " + uniq[1],
        uniq[2],
        "",  # empty doc survives
    ]
    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    ))
    out = span_dedup(ds, window=20).to_pandas().set_index("doc_id")
    # both planted docs lose exactly the 30 passage tokens
    for d in (0, 1):
        assert out.loc[d, "n_covered_tokens"] == 30
        assert out.loc[d, "n_dup_windows"] == 11  # 30 - 20 + 1
        assert "tok0" not in out.loc[d, "clean_text"]
    assert out.loc[0, "clean_text"] == uniq[0]
    assert out.loc[1, "clean_text"] == uniq[1]
    assert out.loc[2, "n_covered_tokens"] == 0
    assert out.loc[2, "clean_text"] == uniq[2]
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "clean_text"] == ""


def test_span_dedup_matches_naive(ray_session):
    """Window-level parity with a naive set-based implementation on a
    random corpus with planted repeats."""
    import random

    import ray.data as rd

    from rdf_diff_store_ray.functions.text import span_dedup

    rng = random.Random(7)
    W = 5
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab) for _ in range(60))
            for _ in range(12)]
    docs.append(docs[0])  # exact dup -> every window duplicated

    # naive: count every W-token window across the corpus
    from collections import Counter

    win_counts = Counter()
    for t in docs:
        toks = t.split()
        for i in range(len(toks) - W + 1):
            win_counts[tuple(toks[i:i + W])] += 1

    naive_cov = []
    for t in docs:
        toks = t.split()
        cov = [False] * len(toks)
        nwin = 0
        for i in range(len(toks) - W + 1):
            if win_counts[tuple(toks[i:i + W])] >= 2:
                nwin += 1
                for j in range(i, i + W):
                    cov[j] = True
        naive_cov.append((sum(cov), nwin))

    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    ))
    out = span_dedup(ds, window=W).to_pandas().set_index("doc_id")
    for d, (ncov, nwin) in enumerate(naive_cov):
        assert out.loc[d, "n_covered_tokens"] == ncov, d
        assert out.loc[d, "n_dup_windows"] == nwin, d


# ------------------------------------------------------------- char LM


def _naive_lm_score(texts_train, text):
    """Per-char dict-based stupid backoff mirror of functions.lm."""
    from collections import Counter

    uni, bi, tri = Counter(), Counter(), Counter()
    for t in texts_train:
        b = t.encode("utf-8")
        for i, c in enumerate(b):
            uni[c] += 1
            if i >= 1:
                bi[(b[i - 1], c)] += 1
            if i >= 2:
                tri[(b[i - 2], b[i - 1], c)] += 1
    total = sum(uni.values())
    import math

    b = text.encode("utf-8")
    logp = 0.0
    for i, c in enumerate(b):
        p1 = max(uni.get(c, 0), 0.5) / total
        if i >= 1:
            prev = b[i - 1]
            if (prev, c) in bi and uni.get(prev, 0) > 0:
                p2 = bi[(prev, c)] / uni[prev]
            else:
                p2 = 0.4 * p1
        else:
            p2 = p1
        if i >= 2:
            p21 = b[i - 2], b[i - 1]
            if (p21[0], p21[1], c) in tri and bi.get(p21, 0) > 0:
                p = tri[(p21[0], p21[1], c)] / bi[p21]
            else:
                p = 0.4 * p2
        else:
            p = p2
        logp += math.log(p)
    return logp


def test_char_lm_matches_naive(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.lm import char_lm_train, lm_perplexity

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cats and dogs and logs",
        "größe straße naïve café",  # multi-byte UTF-8
    ]
    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    ))
    model = char_lm_train(ds)
    out = lm_perplexity(ds, model).to_pandas().set_index("doc_id")
    for d, t in enumerate(texts):
        want = _naive_lm_score(texts, t)
        got = out.loc[d, "logprob_x1000"] / 1000.0
        assert abs(got - want) < 2e-3, (d, got, want)
        assert out.loc[d, "n_bytes"] == len(t.encode("utf-8"))


def test_char_lm_discriminates_junk(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.lm import char_lm_train, lm_perplexity

    english = [
        "the quick brown fox jumps over the lazy dog near the river",
        "a small house stands on the green hill beside the old mill",
        "children play in the park while parents watch from the bench",
    ] * 5
    train = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(english)), pa.int64()),
         "text": pa.array(english, pa.string())}
    ))
    model = char_lm_train(train)
    probe = ["the brown dog jumps over the green hill near the park",
             "zq xv kjw qqpz vxk zzj wqx kvz jqq xwz pkv zqx wjk"]
    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(2), pa.int64()),
         "text": pa.array(probe, pa.string())}
    ))
    out = lm_perplexity(ds, model).to_pandas().set_index("doc_id")
    assert out.loc[0, "ppl_x100"] < out.loc[1, "ppl_x100"] / 3


def test_char_lm_empty_corpus_raises(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.lm import char_lm_train

    empty = rd.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string())}
    ))
    with pytest.raises(ValueError, match="empty"):
        char_lm_train(empty)


def test_new_ops_invariant_under_repartitioning(ray_session):
    """BPE training, span dedup and LM scoring must not depend on batch
    boundaries: 1-block vs 5-block inputs give identical results."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import bpe_train
    from rdf_diff_store_ray.functions.lm import char_lm_train, lm_perplexity
    from rdf_diff_store_ray.functions.text import span_dedup

    passage = " ".join(f"tok{i}" for i in range(25))
    texts = [
        f"doc {d} unique words w{d}a w{d}b w{d}c " + (passage if d % 3 == 0
                                                      else "")
        for d in range(20)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    one = rd.from_arrow(tbl)
    many = rd.from_arrow(tbl).repartition(5)

    assert bpe_train(one, n_merges=30) == bpe_train(many, n_merges=30)

    s1 = span_dedup(one, window=10).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    s2 = span_dedup(many, window=10).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(s1, s2)

    m1, m2 = char_lm_train(one), char_lm_train(many)
    assert m1["total"] == m2["total"]
    assert (m1["tri_keys"] == m2["tri_keys"]).all()
    assert (m1["tri_counts"] == m2["tri_counts"]).all()
    p1 = lm_perplexity(one, m1).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    p2 = lm_perplexity(many, m1).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(p1, p2)


# ------------------------------------------------------------- seq packing
def test_pack_sequences_invariants(ray_session):
    """Packed stream properties: every sequence except the last is
    exactly full, totals are conserved, empty docs are absent, and the
    layout is invariant to the partitioning knobs (it depends only on
    doc order + capacity)."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.packing import pack_sequences

    cap = 64
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = pack_sequences(docs, capacity=cap, num_partitions=16).to_pandas()
    per_seq = out.groupby("seq_id")["n_tok"].sum()
    assert (per_seq.iloc[:-1] == cap).all() and 0 < per_seq.iloc[-1] <= cap
    assert (out["n_tok"] > 0).all() and (out["n_tok"] <= cap).all()
    # totals conserved vs a direct count
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    txt = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"]
    total = pc.sum(pc.count_substring_regex(txt, r"\S+")).as_py()
    assert out["n_tok"].sum() == total
    # knob invariance: different bucket_span / partitions, same layout
    out2 = (
        pack_sequences(docs, capacity=cap, bucket_span=7, num_partitions=3)
        .to_pandas()
    )
    import pandas as pd

    a = out.sort_values(["doc_id", "seq_id"], ignore_index=True)
    b = out2.sort_values(["doc_id", "seq_id"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_rejects_bad_capacity(ray_session):
    import ray.data as rd

    import pytest as _pytest

    from rdf_diff_store_ray.functions.packing import pack_sequences

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    with _pytest.raises(ValueError):
        pack_sequences(docs, capacity=0)


def test_approx_quantiles_rank_error_bound(ray_session):
    """Sub-sampled sketch: every estimated quantile's true rank is
    within the 4·sqrt(q(1-q)/m) sampling bound; full-sample run is
    exact; both deterministic."""
    import duckdb
    import numpy as np

    from rdf_diff_store_ray.pipelines.relational import approx_quantiles_price

    sf = "/root/testdata/sf0.01"
    vals = duckdb.sql(
        f"SELECT l_extendedprice FROM read_parquet('{sf}/lineitem.parquet')"
    ).df()["l_extendedprice"].to_numpy()
    vals.sort()
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)

    sub = approx_quantiles_price(sf, qs=qs, target_sample=8192).to_pandas()
    m = int(sub["n_sampled"].iloc[0])
    assert 0 < m < len(vals)
    for g, q in zip(sub["price_cents"], qs):
        rank = np.searchsorted(vals, g, side="right") / len(vals)
        bound = 4 * np.sqrt(q * (1 - q) / m)
        assert abs(rank - q) <= bound, (q, rank, bound)

    full = approx_quantiles_price(sf, qs=qs, target_sample=10**9).to_pandas()
    assert int(full["n_sampled"].iloc[0]) == len(vals)
    for g, q in zip(full["price_cents"], qs):
        idx = max(0, min(len(vals) - 1, int(np.ceil(q * len(vals))) - 1))
        assert g == int(vals[idx])

    again = approx_quantiles_price(sf, qs=qs, target_sample=8192).to_pandas()
    assert again.equals(sub)


def test_weighted_sample_statistics_and_determinism(ray_session):
    """E-S weighted sampling: heavy rows (1000x weight) are always
    drawn, draws are deterministic per seed, different across seeds,
    batch-boundary invariant, zero weights never selected."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rdf_diff_store_ray.functions.sampling import weighted_sample

    n = 500
    w = np.ones(n)
    w[:10] = 1000.0  # heavies
    w[490:] = 0.0    # never selected
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "w": pa.array(w, pa.float64()),
        }
    )
    out = weighted_sample(
        rd.from_arrow(tbl), k=50, weight_col="w", key_col="doc_id", seed=3
    )
    assert len(out) == 50 and out["doc_id"].is_unique
    assert set(range(10)) <= set(out["doc_id"])      # all heavies in
    assert not (set(range(490, 500)) & set(out["doc_id"]))  # no zeros
    # deterministic per seed; different seeds differ; batch-invariant
    out2 = weighted_sample(
        rd.from_arrow(tbl), k=50, weight_col="w", key_col="doc_id", seed=3
    )
    assert out.equals(out2)
    out3 = weighted_sample(
        rd.from_arrow(tbl).repartition(7), k=50, weight_col="w",
        key_col="doc_id", seed=3,
    )
    assert list(out3["doc_id"]) == list(out["doc_id"])
    other = weighted_sample(
        rd.from_arrow(tbl), k=50, weight_col="w", key_col="doc_id", seed=4
    )
    assert list(other["doc_id"]) != list(out["doc_id"])
    # uniform weights: inclusion frequency is roughly flat across seeds
    uni = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "w": pa.array(np.ones(100), pa.float64()),
        }
    )
    counts = np.zeros(100)
    for s in range(30):
        got = weighted_sample(
            rd.from_arrow(uni), k=20, weight_col="w", key_col="doc_id",
            seed=s,
        )
        counts[got["doc_id"].to_numpy()] += 1
    # expectation 6 per row over 30 draws of 20/100; loose 0-count check
    assert counts.min() >= 1 and counts.max() <= 15, counts


def test_bloom_filter_membership(ray_session):
    """Bloom build/probe: zero false negatives (every doc containing a
    bench 3-gram is flagged), false positives within the sizing bound,
    deterministic across runs, and short docs contribute no n-grams."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import bloom_build, bloom_probe

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(400)]
    bench_texts = [
        " ".join(rng.choice(vocab, size=12)) for _ in range(10)
    ]
    clean = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(60)
    ]
    # plant a bench 3-gram inside some corpus docs
    planted_ids = [3, 17, 41]
    corpus = list(clean)
    for i, did in enumerate(planted_ids):
        toks = bench_texts[i].split()
        corpus[did] = corpus[did] + " " + " ".join(toks[4:7])
    corpus.append("one two")  # < ngram tokens → no n-grams, never flagged
    ids = list(range(len(corpus)))

    bloom = bloom_build(
        rd.from_pandas(pd.DataFrame({"text": bench_texts})), ngram=3
    )
    assert bloom == bloom_build(  # deterministic build
        rd.from_pandas(pd.DataFrame({"text": bench_texts})), ngram=3
    )
    out = (
        bloom_probe(
            rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": corpus})),
            bloom, ngram=3,
        )
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    # exact oracle: does the doc contain any bench 3-gram as tokens?
    bench_grams = set()
    for t in bench_texts:
        tk = t.split()
        bench_grams |= {
            " ".join(tk[i:i + 3]) for i in range(len(tk) - 2)
        }
    truth = []
    for t in corpus:
        tk = t.split()
        grams = {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
        truth.append(bool(grams & bench_grams))
    truth = pd.Series(truth)
    flagged = out.set_index("doc_id")["flagged"].reindex(ids)
    # no false negatives
    assert bool((flagged[truth.values]).all())
    assert set(np.flatnonzero(truth.values)) >= set(planted_ids)
    # false positives bounded: with m=2^20 bits, k=4, ~100 elements the
    # fp rate is ~(kn/m)^k ≈ 1e-14 — none expected at this size
    assert flagged[~truth.values].sum() == 0
    short = out[out["doc_id"] == ids[-1]].iloc[0]
    assert short["n_ngrams"] == 0 and not short["flagged"]
    assert (out["n_hits"] <= out["n_ngrams"]).all()


def test_collocations_and_top_terms_nul_tokens(ray_session, tmp_path):
    """Tokens containing NUL bytes must count as distinct terms through
    the bigram/dictionary-encode path AND the per-lang top-k tie-break
    (a NUL-truncating hash or multi-key sort would collapse 'm\\x00k'
    and 'm\\x00n' into one term)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_diff_store_ray.pipelines.queries import (
        collocations, top_terms_per_lang,
    )

    a, b = "m\x00k", "m\x00n"
    texts = [f"{a} {b} {a} {b} x", f"{a} plain"]
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en", "en"])}),
        tmp_path / "documents.parquet",
    )

    col = collocations(str(tmp_path), k=10).to_pandas()
    pairs = {(r.w1, r.w2): (r.pair_n, r.w1_n, r.w2_n)
             for r in col.itertuples()}
    assert pairs[(a, b)] == (2, 3, 2)   # a appears 3x overall, b 2x
    assert pairs[(b, a)] == (1, 2, 3)
    assert pairs[(b, "x")] == (1, 2, 1)
    assert pairs[(a, "plain")] == (1, 3, 1)
    assert len(pairs) == 4

    top = top_terms_per_lang(str(tmp_path), k=10).to_pandas()
    top = top.sort_values("rank", ignore_index=True)
    assert list(top["token"]) == [a, b, "plain", "x"]
    assert list(top["n"]) == [3, 2, 1, 1]
    assert list(top["rank"]) == [1, 2, 3, 4]


def test_chunk_documents_batch_reconstruction_property():
    """Property: stride-prefixes of the chunks concatenate back to the
    document (the overlap invariant), offsets/ids are consistent, and
    chunk sizes are bounded. Pure-kernel test — no Ray."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from rdf_diff_store_ray.functions.chunking import chunk_documents_batch

    @settings(max_examples=60, deadline=None)
    @given(
        texts=st.lists(st.text(max_size=120), min_size=1, max_size=6),
        size=st.integers(2, 40),
        over=st.integers(0, 30),
    )
    def prop(texts, size, over):
        stride = max(1, size - over)
        b = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        t = chunk_documents_batch(b, size=size, stride=stride)
        by_doc: dict = {}
        for d, cid, off, chunk in zip(
            t["doc_id"].to_pylist(), t["chunk_id"].to_pylist(),
            t["off"].to_pylist(), t["chunk"].to_pylist(),
        ):
            assert off == cid * stride
            assert 0 < len(chunk) <= size
            by_doc.setdefault(d, []).append((cid, chunk))
        for d, text in enumerate(texts):
            chunks = [c for _, c in sorted(by_doc.get(d, []))]
            if not text:
                assert chunks == []
                continue
            # overlap removal: stride-prefix of every chunk but the
            # last, then the whole last chunk
            rebuilt = "".join(c[:stride] for c in chunks[:-1]) + chunks[-1]
            assert rebuilt == text
            assert chunks == [text[i * stride:i * stride + size]
                              for i in range(len(chunks))]

    prop()


def test_hash_embed_and_chunk_search_planted_relevance(ray_session):
    """The composed chunk→embed→top-k path surfaces a planted relevant
    chunk at rank 1; the embedder is batch-boundary invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rdf_diff_store_ray.functions.chunking import chunk_documents
    from rdf_diff_store_ray.functions.embedding import (
        hash_embed,
        hash_embed_batch,
    )
    from rdf_diff_store_ray.functions.similarity import brute_force_topk

    probe = "zebra quagga okapi wildebeest gnu antelope"
    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": [f"filler text number {i} about nothing much" * 3
                 for i in range(39)] + [(probe + " ") * 4],
    })
    chunks = chunk_documents(rd.from_pandas(docs), size=120, stride=90)

    def keyed(b):
        vid = b["doc_id"].to_pandas() * 1000 + b["chunk_id"].to_pandas()
        return pa.table({"doc_id": pa.array(vid, pa.int64()),
                         "text": b["chunk"]})

    emb = hash_embed(chunks.map_batches(keyed, batch_format="pyarrow"),
                     dim=64)
    q = np.array(hash_embed_batch(
        pa.table({"doc_id": [0], "text": [probe]}),
        dim=64)["embedding"].to_pylist())
    top = brute_force_topk(emb, q, k=3).to_pandas()
    best = top[top["rank"] == 1].iloc[0]
    assert int(best["vec_id"]) // 1000 == 39
    assert best["cosine"] > 0.5

    # batch-boundary invariance: 1-row batches embed identically
    one = rd.from_pandas(docs).repartition(20)
    m_a = hash_embed(rd.from_pandas(docs), dim=32).to_pandas()
    m_b = hash_embed(one, dim=32).to_pandas()
    a = {r["vec_id"]: r["embedding"] for _, r in m_a.iterrows()}
    b = {r["vec_id"]: r["embedding"] for _, r in m_b.iterrows()}
    assert a.keys() == b.keys()
    for kk in a:
        assert np.allclose(a[kk], b[kk])


def test_chunk_and_embed_null_text_behaves_like_empty():
    """Null text rows chunk to nothing and embed to the zero vector —
    a null must not NaN-poison the vectorized length math (ADVICE r3)."""
    import pyarrow as pa

    from rdf_diff_store_ray.functions.chunking import chunk_documents_batch
    from rdf_diff_store_ray.functions.embedding import hash_embed_batch

    b = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma", None, ""], pa.string()),
    })
    t = chunk_documents_batch(b, size=5, stride=4)
    assert t["doc_id"].to_pylist() == [1, 1, 1, 1]  # null + empty → 0 chunks

    e = hash_embed_batch(b, dim=8)
    assert e.num_rows == 3
    vecs = e["embedding"].to_pylist()
    assert all(v == 0.0 for v in vecs[1]) and all(v == 0.0 for v in vecs[2])
    assert any(v != 0.0 for v in vecs[0])


def test_interval_followers_overflow_fallback_matches_fast_path():
    """When user-rank × time-span would wrap int64, the interval-join
    kernel must fall back to per-user segmented searchsorted and produce
    the same counts the composite-key fast path gives on a narrow span
    (ADVICE r3: unguarded overflow corrupted follower counts)."""
    import numpy as np
    import pandas as pd

    from rdf_diff_store_ray.pipelines.relational import _interval_followers

    w_us = np.int64(5) * 60 * 1_000_000
    rng = np.random.default_rng(7)
    n = 400
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    narrow = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": pd.to_datetime(
            base + rng.integers(0, 3600 * 1_000_000, n), unit="us"),
    })
    fast = _interval_followers(narrow, w_us).sort_values(
        "event_id", ignore_index=True)

    # same data shifted onto an astronomically wide span per user rank:
    # force overflow by spreading users across ±250k years
    wide = narrow.copy()
    spread = np.int64(2**62 // 20)
    wide["ts"] = (
        narrow["ts"].to_numpy("datetime64[us]").astype(np.int64)
        - base + wide["user_id"].to_numpy(np.int64) * spread
    ).astype("datetime64[us]")
    slow = _interval_followers(wide, w_us)
    # map wide event ids back and compare counts (per-user windows are
    # unchanged: each user's relative times are identical)
    slow = slow.sort_values("event_id", ignore_index=True)
    assert fast.equals(slow)


def test_scoped_template_lines_match_naive(ray_session):
    """Per-scope template detection == a naive per-scope distinct-doc
    count, on a randomized corpus with cross-scope line collisions (the
    line is template for ONE host only) and NUL-hostile lines."""
    from collections import defaultdict

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import (
        scoped_line_dedup,
        scoped_template_lines,
    )

    rng = np.random.default_rng(11)
    hosts = ["a.com", "b.org", "c.net"]
    pool = ["nav menu", "footer (c)", "body line", "promo\x00twin",
            "promo\x00other", "rare line"]
    rows = []
    for i in range(120):
        h = hosts[rng.integers(0, 3)]
        k = rng.integers(1, 5)
        lines = list(rng.choice(pool, size=k, replace=False))
        if i % 9 == 0:
            lines.append("")  # empty lines never count
        rows.append({"doc_id": i, "host": h, "text": "\n".join(lines)})
    docs = pd.DataFrame(rows)

    naive = defaultdict(set)
    for r in rows:
        for ln in set(r["text"].split("\n")):
            if ln:
                naive[(r["host"], ln)].add(r["doc_id"])
    want = {(h, ln): len(d) for (h, ln), d in naive.items() if len(d) >= 4}

    tpl = scoped_template_lines(
        rd.from_pandas(docs), min_docs=4
    ).to_pandas()
    got = {
        (s, ln): int(n)
        for s, ln, n in zip(tpl["scope"], tpl["line"], tpl["n_docs"])
    }
    assert got == want
    # NUL twins stay distinct keys
    assert ("promo\x00twin" in {k[1] for k in got}) or (
        "promo\x00twin" not in {k[1] for k in want})

    scrubbed = scoped_line_dedup(
        rd.from_pandas(docs), min_docs=4
    ).to_pandas().set_index("doc_id")
    for r in rows:
        keep = [ln for ln in r["text"].split("\n")
                if ln and (r["host"], ln) not in want]
        assert scrubbed.loc[r["doc_id"], "clean_text"] == "\n".join(keep)
        n_all = sum(1 for ln in r["text"].split("\n") if ln)
        assert scrubbed.loc[r["doc_id"], "n_lines"] == n_all
        assert scrubbed.loc[r["doc_id"], "n_dropped"] == n_all - len(keep)


def test_scoped_template_null_scope_rows(ray_session):
    """Hosts parsed from malformed URLs are nullable: null-scope docs
    crash neither detection nor scrub, form no template group, and come
    back unscrubbed (ADVICE r4: str.cat yields NaN keys np.unique cannot
    sort)."""
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import (
        scoped_line_dedup,
        scoped_template_lines,
    )

    docs = pd.DataFrame({
        "doc_id": range(7),
        "host": ["a.com", "a.com", "a.com", None, None, None, "a.com"],
        "text": ["nav\nbody0", "nav\nbody1", "nav\nbody2", "nav\nx0",
                 "nav\nx1", "nav\nx2", "solo"],
    })
    tpl = scoped_template_lines(rd.from_pandas(docs), min_docs=3).to_pandas()
    assert set(zip(tpl["scope"], tpl["line"])) == {("a.com", "nav")}

    out = scoped_line_dedup(rd.from_pandas(docs), min_docs=3) \
        .to_pandas().set_index("doc_id").sort_index()
    # a.com docs lose the template line; null-host docs keep everything
    assert out.loc[0, "clean_text"] == "body0"
    assert out.loc[3, "clean_text"] == "nav\nx0"
    assert out.loc[3, "n_dropped"] == 0
    assert out.loc[6, "clean_text"] == "solo"
    # an all-null-scope corpus is a no-op, not a crash
    docs2 = docs.assign(host=None)
    tpl2 = scoped_template_lines(rd.from_pandas(docs2), min_docs=2) \
        .to_pandas()
    assert len(tpl2) == 0


def test_scoped_template_scope_isolation(ray_session):
    """A line duplicated across DIFFERENT scopes but < min_docs within
    any one scope is NOT template (the whole point of scoping)."""
    import pandas as pd
    import ray.data as rd

    from rdf_diff_store_ray.functions.text import scoped_template_lines

    docs = pd.DataFrame({
        "doc_id": range(6),
        "host": ["h%d.com" % i for i in range(6)],
        "text": ["shared everywhere\nbody %d" % i for i in range(6)],
    })
    tpl = scoped_template_lines(rd.from_pandas(docs), min_docs=2)
    assert tpl.to_pandas().empty
