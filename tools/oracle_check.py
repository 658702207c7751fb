#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf parquet tables,
and compares: row count, column names (sorted), and values (rows sorted,
columns sorted by name). Strict equality — stricter than any plausible
driver normalization, so green here should mean green in CORRECTNESS_r{N}.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])  # optional: check just these query names

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    # Verify records queries that THREW in _failures.json — surface them
    # here even when they have no oracle entry (a rows-only query like
    # q88 would otherwise fail invisibly: no result dir, no oracle row).
    fail_file = out_dir / "_failures.json"
    threw = set()
    if fail_file.exists():
        for name, err in sorted(json.loads(fail_file.read_text()).items()):
            if only and name not in only:
                continue
            print(f"FAIL {name}: query threw during Verify: {err}")
            threw.add(name)
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in threw:
            continue
        res_dir = out_dir / name
        try:
            got = pd.read_parquet(res_dir)
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(w)}")
            n_fail += 1
            continue
        # dtype check: the driver's hash is dtype-KIND-sensitive. DuckDB
        # HUGEINT surfaces as float64/object where Spark emits int64 →
        # hash mismatch even when values agree (observed r1: q22, q37).
        # Int width differences (int32 vs int64) are tolerated (observed
        # r1: q14/q25/q31 were hash-green with int32-vs-int64 columns).
        def kind(dt):
            s = str(dt)
            if s.startswith(("int", "uint")):
                return "int"
            if s.startswith("float"):
                return "float"
            return s
        dtype_bad = [c for c in g.columns if kind(g[c].dtype) != kind(w[c].dtype)]
        mismatch = None
        for ci, c in enumerate(g.columns):
            gv, wv = g[c].tolist(), w[c].tolist()
            for ri in range(len(gv)):
                a, b = gv[ri], wv[ri]
                # timestamps: compare as strings to dodge ns/us dtype noise
                if isinstance(a, pd.Timestamp) or isinstance(b, pd.Timestamp):
                    a, b = str(a), str(b)
                if not values_equal(a, b):
                    mismatch = (c, ri, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, ri, a, b = mismatch
            print(f"FAIL {name}: value col={c} row={ri} spark={a!r} duckdb={b!r}")
            n_fail += 1
        elif dtype_bad:
            details = ", ".join(
                f"{c}: spark={g[c].dtype} duckdb={w[c].dtype}" for c in dtype_bad)
            print(f"FAIL {name}: dtype mismatch ({details})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
