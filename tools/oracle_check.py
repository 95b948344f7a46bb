#!/usr/bin/env python3
"""Local stand-in for the driver's t2 oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet dump (written by
`graft.Verify`), runs the matching SQL from oracle_sql.json in DuckDB
with the sfDir parquet tables registered as views, sorts columns by
name and rows by all columns, and compares cell-by-cell (exact; floats
reported with max-abs-diff on mismatch).
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} != {dc}")
            n_fail += 1
            continue
        # Type sensitivity: the driver hashes typed values, so an
        # oracle that returns HUGEINT/DECIMAL/DOUBLE where the Spark
        # dump has BIGINT diverges even when every cell is equal
        # (q337, round 13). Compare DESCRIBE output on both sides.
        tdiffs = _type_diffs(con, sql, f"{outdir}/{name}/*.parquet")
        if tdiffs:
            print(f"FAIL {name}: output-type divergence: {tdiffs}")
            n_fail += 1
            continue
        import numpy as np
        sortable = [c for c in sc
                    if not isinstance(spark_df[c].iloc[0] if len(spark_df) else None,
                                      (np.ndarray, list))]
        a = spark_df[sc].sort_values(by=sortable).reset_index(drop=True)
        b = duck_df[dc].sort_values(by=sortable).reset_index(drop=True)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        bad = []
        for c in sc:
            av, bv = a[c], b[c]
            for i in range(len(av)):
                x, y = av.iloc[i], bv.iloc[i]
                try:
                    xn, yn = bool(pd.isna(x)), bool(pd.isna(y))
                except (TypeError, ValueError):  # arrays etc.
                    xn = yn = False
                if xn and yn:
                    continue
                if xn != yn or not _eq(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows, {len(sc)} cols)")
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


def _canon_type(t):
    """Collapse spellings that hash identically via pandas (DECIMAL
    scale noise, VARCHAR aliases) but keep width/family distinctions
    the driver's hash can see."""
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t in ("TEXT", "STRING", "CHAR", "BPCHAR"):
        return "VARCHAR"
    if t == "TIMESTAMP_NS":
        return "TIMESTAMP"
    return t


def _type_diffs(con, sql, dump_glob):
    """Per-column type divergences between the oracle SQL's result
    schema and the Spark parquet dump's schema. Returns a list of
    (col, spark_type, duck_type) tuples; empty = clean."""
    def describe(q):
        rows = con.sql(f"DESCRIBE {q}").fetchall()
        return {r[0]: _canon_type(r[1]) for r in rows}
    spark_t = describe(f"SELECT * FROM '{dump_glob}'")
    duck_t = describe(f"({sql})")
    return [(c, spark_t[c], duck_t[c])
            for c in sorted(set(spark_t) & set(duck_t))
            if spark_t[c] != duck_t[c]]


def _eq(x, y):
    import numpy as np
    if isinstance(x, (np.ndarray, list)) or isinstance(y, (np.ndarray, list)):
        return list(x) == list(y)
    if isinstance(x, float) and isinstance(y, float):
        return x == y  # exact — normalization happens in the queries
    try:
        return bool(x == y)
    except Exception:
        return str(x) == str(y)


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query-name filter (matches
    # SPARK_GRAFT_VERIFY_ONLY partial dumps)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        _orig = json.load
        json.load = lambda f: {k: v for k, v in _orig(f).items() if k in only}
    sys.exit(main(sys.argv[1], sys.argv[2]))
