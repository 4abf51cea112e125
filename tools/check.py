#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name> parquet (Spark output) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the raw
tables in <sfDir>, then compares as unordered multisets of rows with
columns sorted by name. Exits nonzero on any mismatch.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)

def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)

# Output column types that hash identically across the driver's two
# readers (pyarrow for Spark parquet, duckdb->pandas for the oracle).
# DECIMAL becomes Decimal objects vs float64, HUGEINT becomes float64 vs
# int64 — both hash-mismatch even when values are equal. Keep outputs in
# this set on BOTH sides (r02 lesson: q28 DECIMAL, q32 HUGEINT).
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
              "FLOAT", "VARCHAR", "DATE", "BOOLEAN"}

def unsafe_cols(rel):
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t).split("(")[0].upper() not in SAFE_TYPES]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            failures += 1
            continue
        bad = (unsafe_cols(con.sql(
                   f"SELECT * FROM read_parquet('{spark_dir}/*.parquet') LIMIT 0"))
               + unsafe_cols(con.sql(f"SELECT * FROM ({sql}) LIMIT 0")))
        if bad:
            print(f"FAIL {name}: unsafe output types {bad}")
            failures += 1
            continue
        gk, ek = rows_key(got_cols, got), rows_key(exp_cols, exp)
        if gk != ek:
            diff = [(a, b) for a, b in zip(gk, ek) if a != b][:3]
            extra_g = [x for x in gk if x not in set(ek)][:3]
            extra_e = [x for x in ek if x not in set(gk)][:3]
            print(f"FAIL {name}: rows {len(gk)} vs {len(ek)}; "
                  f"first diffs {diff or (extra_g, extra_e)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(gk)} rows")
    print(f"{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
