"""Training-shard writer: exact-stream oracle, invariants, hygiene."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs_table(n=37, seed=5, gap=3):
    """Synthetic docs with NON-dense ids (gaps exercise the bucket
    math) and a few empty texts."""
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "kappa", "lambda", "omega", "sigma"]
    texts = []
    for i in range(n):
        if i % 9 == 4:
            texts.append("")  # empty doc packs nothing
        else:
            k = int(rng.integers(3, 40))
            texts.append(" ".join(rng.choice(vocab, size=k)))
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(n, dtype=np.int64) * gap + 11, pa.int64()
            ),
            "text": pa.array(texts, pa.string()),
        }
    )


def _reference_stream(tbl, merges, vocab, capacity):
    """Driver-local oracle: encode in doc_id order, concatenate, split."""
    from rdf_diff_store_ray.functions.bpe import _PRETOK_RE, encode_word

    ranks = {p: i for i, p in enumerate(merges)}
    tok2id = dict(zip(vocab["token"], vocab["token_id"]))
    df = tbl.to_pandas().sort_values("doc_id", ignore_index=True)
    ids = []
    for text in df["text"].fillna(""):
        for w in pd.Series([text]).str.findall(_PRETOK_RE)[0]:
            ids.extend(tok2id[t] for t in encode_word(w, ranks))
    flat = np.array(ids, dtype=np.int32)
    return [
        flat[i: i + capacity] for i in range(0, len(flat), capacity)
    ]


def _read_shards(out_dir):
    rows = []
    for f in sorted(glob.glob(os.path.join(out_dir, "shard-*.parquet"))):
        rows.append(pq.read_table(f))
    t = pa.concat_tables(rows).to_pandas().sort_values(
        "seq_id", ignore_index=True
    )
    return t


def test_training_shards_match_reference_stream(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import bpe_train
    from rdf_diff_store_ray.functions.shards import (
        build_vocab,
        write_training_shards,
    )

    tbl = _docs_table()
    docs = lambda: rd.from_arrow(tbl)  # noqa: E731
    merges = bpe_train(docs(), n_merges=25, max_words=5_000)
    vocab = build_vocab(docs(), merges)
    out = str(tmp_path / "shards")
    capacity = 17
    stats = write_training_shards(
        docs, out, merges=merges, vocab=vocab,
        capacity=capacity, num_shards=3, bucket_span=16, num_partitions=4,
    )

    ref = _reference_stream(tbl, merges, vocab, capacity)
    got = _read_shards(out)
    assert len(got) == len(ref) == stats.attrs["total_seqs"]
    assert list(got["seq_id"]) == list(range(len(ref)))
    for row_ids, ref_ids in zip(got["input_ids"], ref):
        assert np.array_equal(np.asarray(row_ids, np.int32), ref_ids)
    # every sequence full except the global last
    n_tok = got["n_tok"].to_numpy()
    assert (n_tok[:-1] == capacity).all() and 0 < n_tok[-1] <= capacity
    # per-shard stats: contiguous, disjoint, complete
    assert list(stats["first_seq"]) == [0] + list(stats["last_seq"] + 1)[:-1]
    assert int(stats["last_seq"].iloc[-1]) == len(ref) - 1
    assert int(stats["n_tokens"].sum()) == sum(len(r) for r in ref)
    # one file per shard
    files = glob.glob(os.path.join(out, "shard-*.parquet"))
    assert len(files) == len(stats)


def test_training_shards_deterministic(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import bpe_train
    from rdf_diff_store_ray.functions.shards import (
        build_vocab,
        write_training_shards,
    )

    tbl = _docs_table(n=23, seed=9)
    docs = lambda: rd.from_arrow(tbl)  # noqa: E731
    merges = bpe_train(docs(), n_merges=12, max_words=5_000)
    vocab = build_vocab(docs(), merges)
    outs = []
    for leg in ("a", "b"):
        out = str(tmp_path / leg)
        write_training_shards(
            docs, out, merges=merges, vocab=vocab,
            capacity=11, num_shards=2, bucket_span=8, num_partitions=3,
        )
        outs.append(_read_shards(out))
    a, b = outs
    pd.testing.assert_frame_equal(
        a.drop(columns=["input_ids"]), b.drop(columns=["input_ids"])
    )
    for x, y in zip(a["input_ids"], b["input_ids"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_training_shards_empty_corpus_raises(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.shards import write_training_shards

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["", ""], pa.string()),
        }
    )
    with pytest.raises(ValueError):
        write_training_shards(
            lambda: rd.from_arrow(tbl),
            str(tmp_path / "e"),
            merges=[],
            vocab=pd.DataFrame({"token": [], "token_id": []}),
            capacity=8,
            num_shards=2,
        )


def test_train_shards_entry(ray_session):
    from rdf_diff_store_ray.pipelines.queries import train_shards

    t = train_shards("/root/testdata/sf0.001", num_shards=4).to_pandas()
    assert t["files_match"].all()
    assert (t["n_seqs"] > 0).all()
    # balanced contiguous ranges over all shards
    assert int(t["first_seq"].iloc[0]) == 0
    assert (
        t["first_seq"].iloc[1:].to_numpy()
        == t["last_seq"].iloc[:-1].to_numpy() + 1
    ).all()


def test_epoch_order_full_is_deterministic_and_complete(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.shards import epoch_order

    tbl = pa.table({"seq_id": pa.array(np.arange(200, dtype=np.int64)),
                    "v": pa.array(np.arange(200, dtype=np.int64) * 7)})

    def run(epoch, tbl_in):
        out = epoch_order(
            rd.from_arrow(tbl_in), epoch=epoch, seed=3, mode="full"
        ).to_pandas()
        return out

    a = run(0, tbl)
    b = run(0, tbl)
    c = run(1, tbl)
    # identical across runs; different across epochs; same multiset
    pd.testing.assert_frame_equal(a, b)
    assert list(a["seq_id"]) != list(c["seq_id"])
    assert sorted(a["seq_id"]) == sorted(c["seq_id"]) == list(range(200))
    assert list(a["seq_id"]) != list(range(200))  # actually shuffled
    # payload stays attached to its key
    assert (a["v"].to_numpy() == a["seq_id"].to_numpy() * 7).all()
    # batch/block-boundary invariance: same order from a re-blocked input
    import ray.data as rd2

    re_blocked = rd2.from_arrow(tbl).repartition(7)
    d = epoch_order(re_blocked, epoch=0, seed=3, mode="full").to_pandas()
    pd.testing.assert_frame_equal(a, d)


def test_epoch_order_blocks_mode_preserves_multiset(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.shards import epoch_order

    tbl = pa.table({"seq_id": pa.array(np.arange(100, dtype=np.int64))})
    out = epoch_order(
        rd.from_arrow(tbl).repartition(5), epoch=2, seed=1, mode="blocks"
    ).to_pandas()
    assert sorted(out["seq_id"]) == list(range(100))
    with pytest.raises(ValueError):
        epoch_order(rd.from_arrow(tbl), mode="nope")


def test_read_training_shards_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import bpe_train
    from rdf_diff_store_ray.functions.shards import (
        build_vocab,
        read_training_shards,
        write_training_shards,
    )

    tbl = _docs_table(n=20, seed=2)
    docs = lambda: rd.from_arrow(tbl)  # noqa: E731
    merges = bpe_train(docs(), n_merges=10, max_words=5_000)
    vocab = build_vocab(docs(), merges)
    out = str(tmp_path / "shards")
    stats = write_training_shards(
        docs, out, merges=merges, vocab=vocab, capacity=13, num_shards=2,
        bucket_span=8, num_partitions=3,
    )
    ds = read_training_shards(out, epoch=0, seed=7)
    got = ds.to_pandas()
    assert len(got) == stats.attrs["total_seqs"]
    assert sorted(got["seq_id"]) == list(range(len(got)))
    assert list(got.columns) == ["seq_id", "input_ids", "n_tok"]
    with pytest.raises(FileNotFoundError):
        read_training_shards(str(tmp_path / "missing"))


def test_training_shards_resume_recreates_only_missing(ray_session, tmp_path):
    """Kill-and-resume analog: delete one shard file, re-run with
    resume=True — the missing shard is recreated byte-correct, the
    surviving files are not rewritten (mtimes untouched)."""
    import time as _time

    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import bpe_train
    from rdf_diff_store_ray.functions.shards import (
        build_vocab,
        write_training_shards,
    )

    tbl = _docs_table(n=30, seed=13)
    docs = lambda: rd.from_arrow(tbl)  # noqa: E731
    merges = bpe_train(docs(), n_merges=15, max_words=5_000)
    vocab = build_vocab(docs(), merges)
    out = str(tmp_path / "shards")
    kw = dict(merges=merges, vocab=vocab, capacity=19, num_shards=3,
              bucket_span=8, num_partitions=3)
    write_training_shards(docs, out, **kw)
    baseline = _read_shards(out)
    files = sorted(glob.glob(os.path.join(out, "shard-*.parquet")))
    assert len(files) == 3
    os.remove(files[1])
    mtimes = {f: os.path.getmtime(f) for f in files if f != files[1]}
    _time.sleep(0.05)
    write_training_shards(docs, out, resume=True, **kw)
    assert all(os.path.getmtime(f) == mtimes[f] for f in mtimes)
    restored = _read_shards(out)
    pd.testing.assert_frame_equal(
        baseline.drop(columns=["input_ids"]),
        restored.drop(columns=["input_ids"]),
    )
    for x, y in zip(baseline["input_ids"], restored["input_ids"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_tokenizer_save_load_roundtrip(ray_session, tmp_path):
    """A saved+loaded tokenizer produces byte-identical shards — the
    frozen-tokenizer contract."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.bpe import (
        bpe_train,
        load_tokenizer,
        save_tokenizer,
    )
    from rdf_diff_store_ray.functions.shards import (
        build_vocab,
        write_training_shards,
    )

    tbl = _docs_table(n=18, seed=21)
    docs = lambda: rd.from_arrow(tbl)  # noqa: E731
    merges = bpe_train(docs(), n_merges=10, max_words=5_000)
    vocab = build_vocab(docs(), merges)
    path = str(tmp_path / "tokenizer.json")
    save_tokenizer(path, merges, vocab)
    merges2, vocab2 = load_tokenizer(path)
    assert merges2 == merges
    assert vocab2["token"].tolist() == vocab["token"].tolist()
    assert vocab2["token_id"].tolist() == vocab["token_id"].tolist()

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a_dir, merges=merges, vocab=vocab,
                          capacity=11, num_shards=2, bucket_span=8,
                          num_partitions=2)
    write_training_shards(docs, b_dir, merges=merges2, vocab=vocab2,
                          capacity=11, num_shards=2, bucket_span=8,
                          num_partitions=2)
    a, b = _read_shards(a_dir), _read_shards(b_dir)
    pd.testing.assert_frame_equal(
        a.drop(columns=["input_ids"]), b.drop(columns=["input_ids"])
    )
    for x, y in zip(a["input_ids"], b["input_ids"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    # merges-only save round-trips too
    p2 = str(tmp_path / "merges_only.json")
    save_tokenizer(p2, merges)
    m3, v3 = load_tokenizer(p2)
    assert m3 == merges and v3 is None


def test_tokenizer_and_shards_cli(ray_session, tmp_path, capsys):
    import json as _json

    from rdf_diff_store_ray.__main__ import main

    pq.write_table(_docs_table(n=25, seed=30),
                   str(tmp_path / "docs.parquet"))
    tok = str(tmp_path / "tok.json")
    assert main(["tokenizer-train", "--docs", str(tmp_path / "docs.parquet"),
                 "--out", tok, "--merges", "12"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["n_merges"] == 12 and out["vocab_size"] > 0
    shards = str(tmp_path / "shards")
    assert main(["write-shards", "--docs", str(tmp_path / "docs.parquet"),
                 "--tokenizer", tok, "--out", shards,
                 "--capacity", "16", "--shards", "2"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["shards"] == 2 and out["total_tokens"] > 0
    got = _read_shards(shards)
    assert len(got) == out["total_seqs"]


def test_epoch_order_blocks_mode_shuffles_and_preserves(ray_session):
    """Blocks mode: the multiset is preserved and the order is actually
    mixed; run-identical order is NOT guaranteed (Ray's
    randomize_block_order emission varies with executor scheduling —
    the docstring says so; mode="full" is the deterministic path)."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.shards import epoch_order

    tbl = pa.table({"seq_id": pa.array(np.arange(120, dtype=np.int64))})
    out = list(
        epoch_order(
            rd.from_arrow(tbl).repartition(6), epoch=1, seed=9,
            mode="blocks",
        ).to_pandas()["seq_id"]
    )
    assert sorted(out) == list(range(120))
    assert out != list(range(120))
