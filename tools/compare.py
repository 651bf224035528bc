#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run Verify's parquet dumps
against DuckDB oracle SQL over the same fixture tables and diff.

Floats are compared twice: a hard gate at 6 significant digits (matches
the historical local check) and a STRICT pass at 12 significant digits.
The strict pass exists because the driver's hash compare resolved a
divergence in the 7th digit (q300, round 7) that 6g smoothed over —
any STRICT-only diff is reported so it can be adjudicated (true
divergence vs float-sum ulp noise) before a round-close claim.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols, prec):
    # sort columns by name, then rows; stringify with float rounding
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.{prec}g}")
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out, [cols[i] for i in order]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    strict_warn = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_raw = got.fetchall()
            got_cols_raw = [c.lower() for c in got.columns]
            exp = con.sql(sql)
            exp_raw = exp.fetchall()
            exp_cols_raw = [c.lower() for c in exp.columns]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        got_rows, got_cols = canon(got_raw, got_cols_raw, 6)
        exp_rows, exp_cols = canon(exp_raw, exp_cols_raw, 6)
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diff = [(a, b) for a, b in zip(got_rows, exp_rows) if a != b]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows; "
                  f"first diffs: {diff[:3]}")
            n_fail += 1
        else:
            g12, _ = canon(got_raw, got_cols_raw, 12)
            e12, _ = canon(exp_raw, exp_cols_raw, 12)
            if g12 != e12:
                d = [(a, b) for a, b in zip(g12, e12) if a != b]
                strict_warn.append(name)
                print(f"PASS {name} ({len(got_rows)} rows) "
                      f"[STRICT-DIFF {len(d)} rows, first: {d[:2]}]")
            else:
                print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if strict_warn:
        print(f"STRICT (12g) diffs in {len(strict_warn)}: "
              f"{' '.join(strict_warn)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
