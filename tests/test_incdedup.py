"""Incremental MinHash dedup against a persisted band index."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus(n, seed, start_id=0):
    """Distinct multi-sentence docs (enough shingles for stable LSH)."""
    rng = np.random.default_rng(seed)
    words = ["quantum", "ledger", "harbor", "velvet", "python", "basalt",
             "meadow", "circuit", "lantern", "orchid", "timber", "glacier"]
    texts = [
        " ".join(rng.choice(words, size=60)) for _ in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(start_id, start_id + n, dtype=np.int64)
            ),
            "text": pa.array(texts, pa.string()),
        }
    )


def _mutate(text, rng, n_edits=2):
    toks = text.split()
    for _ in range(n_edits):
        toks[int(rng.integers(0, len(toks)))] = "zzz"
    return " ".join(toks)


def test_incremental_dedup_flags_planted_dupes(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        dedup_against_index,
        extend_minhash_index,
    )

    idx = str(tmp_path / "idx")
    base = _corpus(40, seed=3)
    stats = extend_minhash_index(
        rd.from_arrow(base), idx, num_partitions=8
    )
    assert int(stats["rows"].sum()) == 40 * 32  # every band row landed

    # batch: 10 near-dupes of base docs (light edits), 10 fresh docs
    rng = np.random.default_rng(7)
    base_texts = base["text"].to_pylist()
    dup_texts = [_mutate(base_texts[i], rng) for i in range(10)]
    fresh = _corpus(10, seed=99, start_id=2000)
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(1000, 1010, dtype=np.int64)),
            "text": pa.array(dup_texts, pa.string()),
        }
    )
    out = (
        dedup_against_index(rd.from_arrow(batch), idx)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out["is_dup"].all(), out
    # matched_doc points back at the mutated source
    assert (out["matched_doc"].to_numpy() == np.arange(10)).all()

    out_fresh = dedup_against_index(rd.from_arrow(fresh), idx).to_pandas()
    assert not out_fresh["is_dup"].any(), out_fresh
    assert (out_fresh["matched_doc"] == -1).all()
    assert len(out_fresh) == 10  # zero-hit docs still reported


def test_index_extension_is_log_structured(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        dedup_against_index,
        extend_minhash_index,
    )

    idx = str(tmp_path / "idx")
    a = _corpus(20, seed=1)
    b = _corpus(20, seed=2, start_id=500)
    extend_minhash_index(rd.from_arrow(a), idx, num_partitions=4)
    seg0 = set(glob.glob(os.path.join(idx, "bands-*-*.parquet")))
    mtimes0 = {f: os.path.getmtime(f) for f in seg0}
    extend_minhash_index(rd.from_arrow(b), idx, num_partitions=4)
    seg1 = set(glob.glob(os.path.join(idx, "bands-*-*.parquet")))
    # old segments untouched, new ones appended with the next seq
    assert seg0 < seg1
    assert all(os.path.getmtime(f) == mtimes0[f] for f in seg0)
    assert {os.path.basename(f).split("-")[2] for f in seg1 - seg0} == {
        "000001.parquet"
    }

    # the extended index now flags b's own docs as dups (self-identity)
    out = dedup_against_index(rd.from_arrow(b), idx).to_pandas()
    assert out["is_dup"].all()
    assert (out["matched_doc"] == out["doc_id"]).all()


def test_index_knob_mismatch_and_missing_index(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        dedup_against_index,
        extend_minhash_index,
    )

    idx = str(tmp_path / "idx")
    a = _corpus(5, seed=4)
    extend_minhash_index(rd.from_arrow(a), idx, num_partitions=4)
    with pytest.raises(ValueError):
        extend_minhash_index(rd.from_arrow(a), idx, num_partitions=8)
    with pytest.raises(FileNotFoundError):
        dedup_against_index(rd.from_arrow(a), str(tmp_path / "nope"))
    with pytest.raises(ValueError):
        dedup_against_index(rd.from_arrow(a), idx, min_bands=0)


def test_min_bands_monotone(ray_session, tmp_path):
    """Raising min_bands can only shrink the duplicate set."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        dedup_against_index,
        extend_minhash_index,
    )

    idx = str(tmp_path / "idx")
    base = _corpus(30, seed=5)
    extend_minhash_index(rd.from_arrow(base), idx, num_partitions=4)
    rng = np.random.default_rng(11)
    texts = base["text"].to_pylist()
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(100, 130, dtype=np.int64)),
            "text": pa.array(
                [_mutate(t, rng, n_edits=6) for t in texts], pa.string()
            ),
        }
    )
    dups = {}
    for mb in (1, 8, 32):
        out = dedup_against_index(
            rd.from_arrow(batch), idx, min_bands=mb
        ).to_pandas()
        dups[mb] = set(out.loc[out["is_dup"], "doc_id"])
    assert dups[32] <= dups[8] <= dups[1]
    assert dups[1]  # lightly-edited docs collide somewhere


def test_exact_mode_flags_only_byte_identical(ray_session, tmp_path):
    """Exact mode: duplicates are byte-identical texts only — a one-word
    edit passes, an identical re-ingest is flagged."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        dedup_against_index,
        extend_minhash_index,
    )

    idx = str(tmp_path / "idx")
    base = _corpus(15, seed=8)
    extend_minhash_index(
        rd.from_arrow(base), idx, num_partitions=4, mode="exact"
    )
    rng = np.random.default_rng(3)
    texts = base["text"].to_pylist()
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(100, 130, dtype=np.int64)),
            # 15 byte-identical + 15 one-word edits
            "text": pa.array(
                texts + [_mutate(t, rng, n_edits=1) for t in texts],
                pa.string(),
            ),
        }
    )
    out = (
        dedup_against_index(rd.from_arrow(batch), idx)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[100:114, "is_dup"].all()
    assert (
        out.loc[100:114, "matched_doc"].to_numpy() == np.arange(15)
    ).all()
    assert not out.loc[115:129, "is_dup"].any()
    # a minhash-mode call on an exact index must refuse (knob mismatch)
    with pytest.raises(ValueError):
        extend_minhash_index(rd.from_arrow(base), idx, num_partitions=4)


def test_dedup_index_cli(ray_session, tmp_path, capsys):
    import json as _json

    import pyarrow.parquet as pq

    from rdf_diff_store_ray.__main__ import main

    base = _corpus(12, seed=6)
    pq.write_table(base, str(tmp_path / "base.parquet"))
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(100, 106, dtype=np.int64)),
            # 3 byte-identical + 3 fresh
            "text": pa.array(
                base["text"].to_pylist()[:3]
                + _corpus(3, seed=77)["text"].to_pylist(),
                pa.string(),
            ),
        }
    )
    pq.write_table(batch, str(tmp_path / "batch.parquet"))
    idx = str(tmp_path / "idx")

    assert main(["dedup-index-extend", "--docs", str(tmp_path / "base.parquet"),
                 "--index", idx, "--mode", "exact", "--partitions", "4"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["rows_appended"] == 12

    verdicts = str(tmp_path / "verdicts")
    assert main(["dedup-index-check", "--docs", str(tmp_path / "batch.parquet"),
                 "--index", idx, "--out", verdicts]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out == {"n_docs": 6, "n_dup": 3, "n_kept": 3}

    # no --out: summary folds in-stream, same numbers
    assert main(["dedup-index-check", "--docs", str(tmp_path / "batch.parquet"),
                 "--index", idx]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip())
    assert out2 == out


def test_compact_index_preserves_reads(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        compact_index,
        dedup_against_index,
        extend_minhash_index,
    )

    idx = str(tmp_path / "idx")
    for seed, start in ((1, 0), (2, 300), (3, 600)):
        extend_minhash_index(
            rd.from_arrow(_corpus(10, seed=seed, start_id=start)),
            idx, num_partitions=4,
        )
    probe = _corpus(10, seed=2, start_id=300)  # identical to batch 2
    before = dedup_against_index(rd.from_arrow(probe), idx).to_pandas()
    n_seg_before = len(glob.glob(os.path.join(idx, "bands-*-*.parquet")))
    stats = compact_index(idx)
    assert int(stats["segments_merged"].sum()) >= n_seg_before // 2
    n_seg_after = len(glob.glob(os.path.join(idx, "bands-*-*.parquet")))
    assert n_seg_after < n_seg_before
    after = dedup_against_index(rd.from_arrow(probe), idx).to_pandas()
    pd.testing.assert_frame_equal(
        before.sort_values("doc_id", ignore_index=True),
        after.sort_values("doc_id", ignore_index=True),
    )
    # compaction is idempotent (single segments left untouched)
    assert len(compact_index(idx)) == 0


def test_index_writes_are_single_writer(ray_session, tmp_path):
    """A held write lock makes a concurrent extend/compact fail fast —
    the same contract as the delta store's append path."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        compact_index,
        extend_minhash_index,
    )
    from rdf_diff_store_ray.state.append import LogLockedError, StoreWriteLock

    idx = str(tmp_path / "idx")
    extend_minhash_index(rd.from_arrow(_corpus(5, seed=1)), idx,
                         num_partitions=2)
    with StoreWriteLock(idx):
        with pytest.raises(LogLockedError):
            extend_minhash_index(rd.from_arrow(_corpus(5, seed=2,
                                                       start_id=50)),
                                 idx, num_partitions=2)
        with pytest.raises(LogLockedError):
            compact_index(idx)
    # lock released: writes work again
    extend_minhash_index(rd.from_arrow(_corpus(5, seed=2, start_id=50)),
                         idx, num_partitions=2)


def test_extend_with_empty_batch_is_a_noop(ray_session, tmp_path):
    import ray.data as rd

    from rdf_diff_store_ray.functions.incdedup import (
        dedup_against_index,
        extend_minhash_index,
    )

    idx = str(tmp_path / "idx")
    extend_minhash_index(rd.from_arrow(_corpus(5, seed=1)), idx,
                         num_partitions=2)
    n_seg = len(glob.glob(os.path.join(idx, "bands-*-*.parquet")))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    stats = extend_minhash_index(rd.from_arrow(empty), idx,
                                 num_partitions=2)
    assert len(stats) == 0
    assert len(glob.glob(os.path.join(idx, "bands-*-*.parquet"))) == n_seg
    out = dedup_against_index(rd.from_arrow(empty), idx).to_pandas()
    assert len(out) == 0
