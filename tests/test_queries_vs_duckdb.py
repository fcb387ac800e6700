"""Mirror of the driver's correctness gate: every SQL-checked query entry
must match its DuckDB oracle on row-count, schema (column names) and
order-insensitive values at sf0.001."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True)


def _query_names():
    import __ray_entry__ as entrymod

    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(ray_session, duck, name):
    import __ray_entry__ as entrymod

    engine = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    oracle = _canon(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(engine.columns) == list(oracle.columns), (
        f"{name}: columns {list(engine.columns)} != {list(oracle.columns)}"
    )
    assert len(engine) == len(oracle), f"{name}: {len(engine)} vs {len(oracle)} rows"
    pd.testing.assert_frame_equal(engine, oracle, check_dtype=False, check_exact=True)


def test_rows_only_queries_execute(ray_session):
    """Entries without a SQL oracle must at least run and return rows>=0
    with a stable schema (the driver's weaker check)."""
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sql = set(entrymod.oracle_sql())
    for name in sorted(set(qs) - sql):
        out = _to_pandas(qs[name](SF_DIR))
        assert out is not None and len(out.columns) > 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    ds = entrymod.entry()
    assert ds.count() >= 0
    assert "graph_id" in ds.schema().names

def test_bgp_features_covers_every_individual_entry():
    """kg_bgp_features (the driver-cap consolidation slot) must name
    exactly the kg_bgp_* entries registered individually — a new query
    form added to one place but not the other fails here."""
    import inspect

    from rdf_diff_store_ray.pipelines import queries as q

    individual = {
        name[len("kg_bgp_"):] for name in q.registry()
        if name.startswith("kg_bgp_") and name != "kg_bgp_features"
    }
    src = inspect.getsource(q.kg_bgp_features)
    consolidated = {
        line.split('"')[1]
        for line in src.splitlines()
        if line.strip().startswith('"') and ": kg_bgp_" in line
    }
    assert consolidated == individual
