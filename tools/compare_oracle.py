#!/usr/bin/env python3
"""Dev-tool only (driver-side python): compare Verify output parquet against
DuckDB oracle SQL, mimicking the driver's correctness gate. Not part of the
Spark library. Usage: compare_oracle.py <verify_out_dir> <sf_dir>"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n = got_rel.df().shape[0]
            print(f"  ROWS-ONLY {name}: {n} rows")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {str(e)[:200]}")
            n_fail += 1
            continue
        got = got_rel.df()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"✗ {name}: column mismatch {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if got.shape != want.shape:
            print(f"✗ {name}: shape {got.shape} vs {want.shape}")
            n_fail += 1
            continue
        # The driver hashes values, so int64 vs float64 is a FAIL there even
        # when Python's == says equal (32 == 32.0). Mirror that strictness.
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                  if got[c].dtype.kind != want[c].dtype.kind
                  and {got[c].dtype.kind, want[c].dtype.kind} != {"O"}]
        if dt_bad:
            c, a, b = dt_bad[0]
            print(f"✗ {name}: dtype mismatch col {c}: spark={a} oracle={b}")
            n_fail += 1
            continue
        bad = None
        for i in range(got.shape[0]):
            for c in got.columns:
                a, b = norm(got[c].iloc[i]), norm(want[c].iloc[i])
                pa, pb = a is None or a != a, b is None or b != b  # null-ish
                if pa and pb:
                    continue
                if pa != pb or a != b:
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"✗ {name}: first diff row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"✓ {name}: {got.shape[0]} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
