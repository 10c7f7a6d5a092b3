#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark result parquet written by
graft.Verify, sort columns by name, and compare values row-by-row.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v


def compare(name, spark_rows, spark_cols, oracle_rows, oracle_cols):
    issues = []
    if sorted(spark_cols) != sorted(oracle_cols):
        return [f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"]
    if len(spark_rows) != len(oracle_rows):
        return [f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"]
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    oidx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    max_float_diff = 0.0
    for i, (sr, orow) in enumerate(zip(spark_rows, oracle_rows)):
        for c, (si, oi) in enumerate(zip(sidx, oidx)):
            a, b = norm(sr[si]), norm(orow[oi])
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isclose(a, b, rel_tol=0, abs_tol=0):
                    continue
                max_float_diff = max(max_float_diff, abs(a - b))
                issues.append(f"row {i} col {sorted(spark_cols)[c]}: spark={a!r} oracle={b!r} (diff={abs(a-b):.3e})")
            else:
                issues.append(f"row {i} col {sorted(spark_cols)[c]}: spark={a!r} oracle={b!r}")
            if len(issues) > 5:
                issues.append("... (truncated)")
                return issues
    return issues


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(sqls):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        spark = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})")
        spark_rows, spark_cols = spark.fetchall(), [d[0] for d in spark.description]
        try:
            # Type gate (VERDICT r15 #1): DuckDB widens BIGINT sum()/
            # floor-div chains to HUGEINT; Spark writes int64. A type-aware
            # hash canonicalization (Arrow decimal128 vs int64) mismatches
            # on type alone while values compare equal, so a HUGEINT/
            # DECIMAL output column is a hard FAIL even when every cell
            # matches. DESCRIBE binds without executing.
            badtypes = [f"{c}:{t}" for c, t, *_ in
                        con.execute("DESCRIBE " + sqls[name]).fetchall()
                        if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
            oracle = con.execute(sqls[name])
            oracle_rows, oracle_cols = oracle.fetchall(), [d[0] for d in oracle.description]
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        if badtypes:
            print(f"FAIL     {name}: HUGEINT/DECIMAL oracle output {badtypes}"
                  " (driver hash canonicalization mismatch, VERDICT r15 #1)")
            n_fail += 1
            continue
        issues = compare(name, spark_rows, spark_cols, oracle_rows, oracle_cols)
        if issues:
            print(f"FAIL     {name} ({len(spark_rows)} rows)")
            for i in issues[:6]:
                print(f"         {i}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(spark_rows)} rows)")
            n_pass += 1
    # queries without oracle get a rows-only check by the driver
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        # "_"-prefixed dirs (_models) are harness artifacts, not query outputs
        if os.path.isdir(p) and not d.startswith("_") and d not in sqls:
            rows = duckdb.connect().execute(
                f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            status = "ROWS-OK " if rows > 0 else "ROWS-EMPTY"
            if rows == 0:
                n_fail += 1
            else:
                n_skip += 1
            print(f"{status} {d}: {rows} rows (no oracle)")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
