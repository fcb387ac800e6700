"""Hostile-input robustness: non-UTF8 html, empty pages, null text,
duplicate (url, ts) rows — the build must not crash and must keep its
delta-log invariants (``enforce_digest="off"`` since ground-truth text is
absent/corrupt by construction)."""

import pandas as pd
import pyarrow as pa
import pytest


def _garbage_pages() -> pa.Table:
    base = pd.Timestamp("2024-01-01").timestamp()
    step = 86400
    rows = [
        # url, ts-offset(days), html, text
        ("https://g.example/ok", 0, b"<html><body><p>Acme Corp acquired Beta Ltd.</p></body></html>", None),
        ("https://g.example/ok", 1, b"<html><body><p>Acme Corp acquired Beta Ltd.</p></body></html>", None),
        # non-UTF8 bytes
        ("https://g.example/bin", 0, b"\xff\xfe\x00garbage\x80html", None),
        # empty html
        ("https://g.example/empty", 1, b"", None),
        # duplicate (url, ts) — deterministic last-wins tie-break
        ("https://g.example/dup", 0, b"<html><body><p>v1</p></body></html>", None),
        ("https://g.example/dup", 0, b"<html><body><p>v2</p></body></html>", None),
    ]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [int(base + r[1] * step) for r in rows], pa.timestamp("s")
            ),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


@pytest.fixture(scope="module")
def garbage_built(ray_session, tmp_path_factory):
    import ray.data as rd

    from rdf_diff_store_ray.pipelines.build import build

    out = str(tmp_path_factory.mktemp("garbage_kg"))
    res = build(
        rd.from_arrow(_garbage_pages()),
        out,
        gazetteer={"alias_to_eid": {}, "entities": {}},
        num_partitions=4,
        resume=False,
        enforce_digest="off",
    )
    return res


def test_garbage_build_does_not_crash(garbage_built):
    dt = garbage_built.delta_table()
    assert dt.num_rows > 0


def test_empty_and_binary_pages_become_empty_graphs(garbage_built):
    dt = garbage_built.delta_table()
    rows = {
        (r["graph_id"], r["op"]): r["delta_text"] for r in dt.to_pylist()
    }
    # the non-UTF8 and empty pages yield empty-graph updates, not crashes
    assert any(g == "https://g.example/empty" for g, _ in rows)
    assert any(g == "https://g.example/bin" for g, _ in rows)


def test_duplicate_url_ts_last_wins_deterministically(ray_session, tmp_path_factory):
    import ray.data as rd

    from rdf_diff_store_ray.pipelines.build import build

    outs = []
    for i in range(2):
        out = str(tmp_path_factory.mktemp(f"garbage_kg_{i}"))
        res = build(
            rd.from_arrow(_garbage_pages()),
            out,
            gazetteer={"alias_to_eid": {}, "entities": {}},
            num_partitions=4,
            resume=False,
            enforce_digest="off",
        )
        dt = res.delta_table()
        outs.append(
            sorted(
                (r["graph_id"], str(r["warc_ts"]), r["op"], r["delta_text"])
                for r in dt.to_pylist()
            )
        )
    assert outs[0] == outs[1]  # byte-identical across runs


def test_tombstone_emitted_for_vanished_page(garbage_built):
    dt = garbage_built.delta_table()
    ops = {(r["graph_id"], str(r["warc_ts"]), r["op"]) for r in dt.to_pylist()}
    # /dup appears only at day 0 but the page grid extends to day 1 →
    # a delete tombstone at the next snapshot instant
    assert ("https://g.example/dup", "2024-01-02 00:00:00", "delete") in ops
