"""Local replica of the driver's correctness gate.

Runs every queries() entry at sf0.01 alongside its oracle_sql() via DuckDB
and compares row count, schema (column names), and an order-insensitive
value hash. Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = sys.argv[1:] or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            got_raw = to_pandas(qs[name](SF_DIR))
            got = canon(got_raw)
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            exp_raw = con.execute(sqls[name]).df()
            exp = canon(exp_raw)
        except Exception as e:
            print(f"FAIL {name}: sql error {e}")
            failures.append(name)
            continue
        ok = True
        # The real driver hashes raw representations: DuckDB HUGEINT/decimal
        # columns (sum(BIGINT) -> decimal128) land as 'object' dtype here and
        # hash differently from the engine's int64 even when values match.
        # canon() hides that by coercion, so flag it explicitly.
        for c in exp_raw.columns:
            if (exp_raw[c].dtype == object and len(exp_raw)
                    and type(exp_raw[c].iloc[0]).__name__ == "Decimal"):
                print(f"FAIL {name}: oracle col {c!r} is Decimal/HUGEINT — "
                      f"CAST the aggregate to BIGINT in the SQL")
                ok = False
        # the driver hashes raw representations: surface any dtype-KIND
        # divergence (int vs float vs object) the canon() coercion would
        # otherwise hide — warning only (exact driver policy unknown)
        for c in exp_raw.columns:
            if c in got_raw.columns:
                ka = got_raw[c].dtype.kind
                kb = exp_raw[c].dtype.kind
                if ka != kb and {ka, kb} != {"i", "u"}:
                    print(f"WARN {name}: col {c!r} dtype kind ray="
                          f"{got_raw[c].dtype} sql={exp_raw[c].dtype} — "
                          f"may hash-mismatch on the driver")
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns ray={list(got.columns)} sql={list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows ray={len(got)} sql={len(exp)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c].to_numpy(), exp[c].to_numpy()
                if a.dtype.kind == "f":
                    same = (a == b) | (np.isnan(a) & np.isnan(b))
                else:
                    same = a == b
                n_bad = int((~same).sum())
                if n_bad:
                    i = int(np.flatnonzero(~same)[0])
                    print(f"FAIL {name}: col {c!r} {n_bad} mismatches; "
                          f"first row {i}: ray={a[i]!r} sql={b[i]!r} "
                          f"(dtypes {a.dtype}/{b.dtype})")
                    ok = False
        if ok:
            print(f"ok   {name}: rows={len(got)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    if failures:
        print("failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
