#!/usr/bin/env python3
"""Pandas-level emulation of the DRIVER's correctness compare.

tools/compare.py reads BOTH sides through DuckDB, which canonicalizes
away exactly the class of divergence that made q356/q366 driver-red in
round 8 (Spark parquet DECIMAL -> pandas object(Decimal) vs DuckDB
DECIMAL -> float64; DuckDB sum(BIGINT) -> HUGEINT -> float64 vs Spark
int64). The driver hashes PANDAS frames (its q338 'err' traceback is
pandas sort_values), so representation differences that DuckDB-vs-
DuckDB smooths over are real failures there.

This tool loads the Spark side with pandas.read_parquet (pyarrow) and
the oracle side with duckdb .df(), then compares
  1. sorted column names,
  2. per-column dtype KIND (int vs float vs object vs datetime ...),
  3. repr-level canonical rows (floats at 12 sig digits).
A kind mismatch with equal values is reported as REPR-FAIL — green in
compare.py, red at the driver.

Usage: python3 tools/drivergate.py <sfDir> <verifyOutDir> [names...]
"""
import datetime
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_cell(v, prec):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.{prec}g}"
    if isinstance(v, pd.Timestamp):
        return (v.tz_localize(None) if v.tzinfo else v).isoformat()
    if isinstance(v, datetime.date):  # driver-green (q32): normalize
        return pd.Timestamp(v).isoformat()
    return repr(v)


def frame_canon(df, prec=6):
    cols = sorted(df.columns, key=str.lower)
    kinds = {c.lower(): df[c].dtype.kind for c in cols}
    rows = sorted(
        tuple(canon_cell(v, prec) for v in rec)
        for rec in df[cols].itertuples(index=False, name=None))
    return [c.lower() for c in cols], kinds, rows


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    todo = names or sorted(oracle)
    n_pass = n_fail = 0
    for name in todo:
        if name not in oracle:
            print(f"SKIP {name}: no oracle")
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: load error {e}")
            n_fail += 1
            continue
        try:
            gc, gk, gr = frame_canon(got)
            ec, ek, er = frame_canon(exp)
        except Exception as e:
            print(f"FAIL {name}: canon error {type(e).__name__} {e}")
            n_fail += 1
            continue
        kind_diff = {c: (gk[c], ek[c]) for c in gk
                     if gk.get(c) != ek.get(c)
                     # int-width / date-vs-datetime diffs canonicalize
                     # identically; only numeric-kind flips are hostile
                     and not ({gk.get(c), ek.get(c)} <= {"i", "u"}
                              or {gk.get(c), ek.get(c)} <= {"M", "O"})}
        if gc != ec:
            print(f"FAIL {name}: cols {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:2]
            tag = "REPR-FAIL" if kind_diff else "VALUE-FAIL"
            print(f"{tag} {name}: {len(gr)} vs {len(er)} rows; "
                  f"kind-diffs {kind_diff}; first diffs: {diff}")
            n_fail += 1
        else:
            g12, _, gr12 = frame_canon(got, 12)
            _, _, er12 = frame_canon(exp, 12)
            strict = "" if gr12 == er12 else " [STRICT-12g-DIFF]"
            note = f" [kind-diff {kind_diff}]" if kind_diff else ""
            print(f"PASS {name} ({len(gr)} rows){note}{strict}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
