#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only, not
part of the library): run each oracle_sql.json query in DuckDB over the
same sf parquet dir and compare against the Verify parquet dumps.

Faithful to the driver's pandas-based hasher (round-1 lesson):
  - the Spark side is read via pyarrow -> pandas, so DECIMAL columns
    surface as exact decimal.Decimal objects;
  - the oracle side is duckdb .df(), which converts DECIMAL / HUGEINT to
    float64;
  - cells compare with exact Python ==, NO float rounding. Python numeric
    equality is unified across int/float (6 == 6.0) but exact for
    Decimal-vs-float (Decimal('123.40') != 1.4-as-double), which is
    precisely the mismatch the driver's hash catches. A Spark output with
    a decimal physical type therefore fails here, as it does there.
  - rows sort via pandas sort_values, which raises on array/ndarray cells
    exactly like the driver's hasher — nested output columns fail loudly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def sort_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    # mergesort = stable; na_position fixed so both sides agree on nulls.
    # Raises TypeError on ndarray cells — same failure the driver hits.
    return df.sort_values(by=cols, na_position="last", kind="mergesort")


def cell_eq(a, b):
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, pd.Timestamp) or isinstance(b, pd.Timestamp):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b  # exact; int/float unify, Decimal-vs-float stays exact


def decimal_cols(df):
    out = []
    for c in df.columns:
        col = df[c]
        # full-column scan: a decimal column whose first rows are all null
        # must still be flagged (the driver hashes every row)
        if col.dtype == object and any(isinstance(v, Decimal) for v in col):
            out.append(c)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        # graft.GenData writes Spark-style DIRECTORIES; driver fixtures are
        # single files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        if t == "events":
            # GenData stores ts as epoch-NANOS BIGINT (Spark cannot write
            # TIMESTAMP(NANOS)); mirror graft.sources.Tables' load
            # conversion so oracle SQL sees a timestamp either way
            ts_type = dict((r[0], r[1]) for r in
                           con.execute("DESCRIBE SELECT * FROM events").fetchall())["ts"]
            if ts_type == "BIGINT":
                con.execute("DROP VIEW events")
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) "
                    f"FROM read_parquet('{src}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no verify parquet output")
            n_fail += 1
            continue
        try:
            got = pq.ParquetDataset(files).read().to_pandas()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in got.columns) != sorted(c.lower() for c in exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            continue
        got.columns = [c.lower() for c in got.columns]
        exp.columns = [c.lower() for c in exp.columns]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # decimal physical types on the SPARK side are driver-unsafe even if
        # values happen to compare equal locally — flag before comparing
        dec = decimal_cols(got)
        if dec:
            print(f"FAIL {name}: spark output has DECIMAL column(s) {dec} "
                  f"(driver hashes Decimal vs duckdb float64 — cast to DOUBLE/VARCHAR)")
            n_fail += 1
            continue
        # round-2 lesson: the driver hashes pandas VALUES, so an int64 column
        # on one side vs float64 on the other (duckdb ceil/floor -> DOUBLE,
        # sum(BIGINT) window -> HUGEINT -> float64) hash-differs even though
        # 6 == 6.0 compares equal. Flag integer-vs-float kind mismatches.
        kind_bad = [c for c in got.columns
                    if {got[c].dtype.kind, exp[c].dtype.kind} == {"i", "f"}
                    or {got[c].dtype.kind, exp[c].dtype.kind} == {"u", "f"}]
        if kind_bad:
            print(f"FAIL {name}: int-vs-float physical dtype mismatch on "
                  f"{[(c, str(got[c].dtype), str(exp[c].dtype)) for c in kind_bad]} "
                  f"(driver hash differs — cast BOTH sides to BIGINT or DOUBLE)")
            n_fail += 1
            continue
        try:
            g = sort_rows(got)
            e = sort_rows(exp)
        except (TypeError, ValueError) as te:
            # ndarray cells raise ValueError ("truth value of an array...")
            # from pandas, plain unhashables raise TypeError — both are the
            # same driver-breaking condition; fail the QUERY, not the script
            print(f"FAIL {name}: unsortable/nested column (driver-breaking): {te}")
            n_fail += 1
            continue
        bad = None
        gv, ev = g.values, e.values
        for i in range(len(gv)):
            for j in range(gv.shape[1]):
                if not cell_eq(gv[i][j], ev[i][j]):
                    bad = (i, g.columns[j], gv[i][j], ev[i][j])
                    break
            if bad:
                break
        if bad is None:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            i, c, a, b = bad
            print(f"FAIL {name}: first diff row {i} col {c}: "
                  f"got {a!r} ({type(a).__name__}) exp {b!r} ({type(b).__name__})")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
