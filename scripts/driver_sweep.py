"""Driver-emulation sweep: run the graded registry prefix at sf0.01 and
compare every SQL-checked entry against its DuckDB oracle the way the
driver does (sorted columns, sorted rows, exact values). Usage:

    python scripts/driver_sweep.py [sf_dir] [n_entries]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    bad = 0
    for i, (name, fn) in enumerate(qs.items()):
        if i >= N:
            break
        t0 = time.monotonic()
        try:
            out = fn(SF)
            df = (out if isinstance(out, pd.DataFrame)
                  else out.to_pandas())
            status = f"rows={len(df)}"
            if name in sqls:
                oracle = con.execute(sqls[name]).df()
                a, b = canon(df), canon(oracle)
                assert list(a.columns) == list(b.columns), (
                    f"cols {list(a.columns)} != {list(b.columns)}")
                assert len(a) == len(b), f"rows {len(a)} != {len(b)}"
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True)
                status += " SQL-OK"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            bad += 1
        print(f"[{i:02d}] {name}: {status} ({time.monotonic()-t0:.1f}s)",
              flush=True)
    ray.shutdown()
    print(f"sweep done, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
