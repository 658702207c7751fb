#!/usr/bin/env python3
"""Independent closure oracle for the component queries at scale.

DuckDB's recursive reachability CTE is interpreter-bound at sf1.0
(55k planted-dup docs), so q75/q105/q107/q123 were value-verified only
at sf0.01, with sf1.0 resting on a Spark-vs-Spark cross-check. This
tool closes that gap with the q88/q129 fixture pattern: everything
EXCEPT the closure runs as the real dumped oracle SQL in DuckDB
(pair derivation, scoring, splits — the non-recursive 95% of each
query), and the closure itself is recomputed by a THIRD mechanism — a
python union-find with path compression — sharing nothing with either
Spark's iterative min-label propagation or DuckDB's recursive CTE.

Usage: closure_witness.py <verify_out_dir> <sf_dir>

<verify_out_dir> must contain oracle_sql.json and the four queries'
parquet results (graft.Verify output at <sf_dir>). Exits nonzero on
any divergence.
"""
import json
import re
import sys
from pathlib import Path

import duckdb
import pandas as pd

QUERIES = ["q75_neardup_components", "q105_component_keep_best",
           "q107_leakage_safe_split", "q123_incremental_components"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the recursive block shared verbatim by all four oracles
REACH_RE = re.compile(
    r"reach AS \(.*?\),\s*comp AS \(SELECT id, min\(r\) AS comp "
    r"FROM reach GROUP BY id\)", re.DOTALL)


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def union_find(ids, pairs):
    parent = {i: i for i in ids}
    size = {i: 1 for i in ids}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    # canonical representative = MIN member id (what all engines emit)
    comp_min = {}
    for i in ids:
        r = find(i)
        if r not in comp_min or i < comp_min[r]:
            comp_min[r] = i
    return {i: comp_min[find(i)] for i in ids}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            # widen integer families to one dtype so int32-vs-int64
            # schema noise cannot fail the compare; floats stay floats
            # (a floor-cast here would MASK numeric divergence — this
            # tool's one job is to detect it)
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns),
                            kind="mergesort").reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    sqls = json.load(open(Path(out_dir) / "oracle_sql.json"))
    con = connect(sf_dir)

    # pairs + corpus ids through the REAL dumped q75 prefix (everything
    # before the edges CTE is the exact oracle text, so the witness can
    # never drift from what the sf0.01 gate checks)
    q75 = sqls[QUERIES[0]]
    cut = q75.index("edges AS")
    prefix = q75[:cut].rstrip().rstrip(",")
    pairs = con.execute(
        prefix + "\nSELECT id_a, id_b FROM pairs").fetchall()
    cut_sh = q75.index("sh AS")
    ids = [r[0] for r in con.execute(
        q75[:cut_sh].rstrip().rstrip(",") +
        "\nSELECT doc_id FROM corpus").fetchall()]
    print(f"[closure-witness] sf={sf_dir}: {len(ids)} docs, "
          f"{len(pairs)} near-dup pairs")

    comp = union_find(ids, pairs)
    comp_df = pd.DataFrame(
        {"id": list(comp.keys()), "comp": list(comp.values())})
    con.register("comp_py", comp_df)

    failures = 0
    for name in QUERIES:
        sql = sqls[name]
        swapped, nsub = REACH_RE.subn(
            "comp AS (SELECT id, comp FROM comp_py)", sql)
        if nsub != 1:
            print(f"FAIL {name}: recursive block not found in oracle SQL")
            failures += 1
            continue
        expected = normalize(con.execute(swapped).fetchdf())
        got_path = Path(out_dir) / name
        got = normalize(duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{got_path}/*.parquet')").fetchdf())
        if list(expected.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"vs {list(expected.columns)}")
            failures += 1
        elif len(expected) != len(got):
            print(f"FAIL {name}: {len(got)} rows vs {len(expected)}")
            failures += 1
        elif not expected.equals(got):
            diff = (expected != got).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())} differing rows, first:\n"
                  f"{expected[diff].head(3)}\nvs\n{got[diff].head(3)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows, union-find closure)")
    if failures:
        sys.exit(1)
    print("[closure-witness] PASS: all four component queries match the "
          "union-find closure")


if __name__ == "__main__":
    main()
