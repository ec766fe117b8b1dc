"""Mirror of the driver's correctness gate for a representative subset
(fast ones) at sf0.001: Ray result vs DuckDB oracle, order-insensitive.
The full gate is scripts/selfcheck.py."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
# every SQL-checked query (the full driver gate, at the small scale)
import __ray_entry__ as _e
SUBSET = sorted(_e.oracle_sql())


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem", "events", "orders",
              "customer", "supplier", "nation", "region", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as e
    got = e.queries()[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got = normalize(got)
    want = normalize(con.sql(e.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
