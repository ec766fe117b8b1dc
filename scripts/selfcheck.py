"""Replicates the driver's correctness gate locally: run every
queries() entry and its oracle_sql() through DuckDB on the same parquet
tables, compare row count, column names, and order-insensitive values.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows, "
                  f"{len(got.columns)} cols ({el:.1f}s)")
            if len(got) == 0 and name not in ("minhash_dedup",
                                              "simhash_pairs"):
                failures.append(name)
                print(f"[FAIL] {name}: zero rows")
            continue
        want = normalize(con.sql(oracles[name]).df())
        ok = True
        if list(got.columns) != list(want.columns):
            ok = False
            print(f"[FAIL] {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
        elif len(got) != len(want):
            ok = False
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
            except AssertionError as e:
                ok = False
                print(f"[FAIL] {name}: values differ\n{str(e)[:500]}")
                mism = (got != want).any(axis=1)
                print(got[mism].head(3))
                print(want[mism].head(3))
        if ok:
            print(f"[ OK ] {name}: {len(got)} rows match ({el:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
