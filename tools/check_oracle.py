#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet under verifyOutDir (Spark results written by
graft.Verify), runs the matching SQL from oracle_sql.json in DuckDB with
views registered over the sfDir parquet tables, and compares: column
names (sorted), row count, and exact values (doubles bitwise after
round-trip through float64).
"""
import sys, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(colnames), out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

# Above this many result rows the pure-Python tuple sort-compare is the
# bottleneck (d09 at sf1 = ~50M pair rows burned >1 CPU-hour); switch to
# an exact in-DuckDB compare: same column-name, type-class, and rowcount
# checks, then EXCEPT ALL in both directions (bit-exact on doubles; NaN
# groups as equal under DuckDB's total order, matching norm()'s NaN tag).
BIG_ROWS = int(__import__("os").environ.get("CHECK_ORACLE_BIG_ROWS", 2_000_000))

def numclass(t):
    s = str(t)
    if s.startswith("decimal") and "128" in s or s == "int128":
        return "wide"
    if s.startswith(("int", "uint")):
        return "int"  # driver canon: all int widths hash equal
    if s.startswith("decimal"):
        return s
    return None

def check_big(con, name, sql, spark_glob, n_spark):
    con.execute(f"CREATE OR REPLACE TEMP TABLE __oracle AS {sql}")
    s_schema = con.execute(
        f"SELECT * FROM read_parquet('{spark_glob}') LIMIT 0").fetch_arrow_table().schema
    d_schema = con.execute("SELECT * FROM __oracle LIMIT 0").fetch_arrow_table().schema
    type_errs = []
    for c in sorted(set(s_schema.names) & set(d_schema.names)):
        st, dt = s_schema.field(c).type, d_schema.field(c).type
        sn, dn = numclass(st), numclass(dt)
        if (sn or dn) and sn != dn:
            type_errs.append(f"{c}: spark={st} duck={dt}")
    for c in s_schema.names:
        if str(s_schema.field(c).type).startswith(("list", "large_list")):
            type_errs.append(f"{c}: list-typed column (driver canon crashes)")
    if type_errs:
        return f"FAIL {name}: typed mismatch: {'; '.join(type_errs)}"
    if sorted(s_schema.names) != sorted(d_schema.names):
        return (f"FAIL {name}: columns differ spark={sorted(s_schema.names)} "
                f"duck={sorted(d_schema.names)}")
    n_duck = con.execute("SELECT count(*) FROM __oracle").fetchone()[0]
    if n_spark != n_duck:
        return f"FAIL {name}: rowcount spark={n_spark} duck={n_duck}"
    # Temporal columns: the small path normalizes through
    # isoformat()[:26] (microseconds); mirror that here by casting both
    # sides to microsecond TIMESTAMP, else a sub-microsecond precision
    # difference (e.g. TIMESTAMP_NS vs TIMESTAMP) would flip the verdict
    # between the two paths.
    def sel(c):
        if str(s_schema.field(c).type).startswith("timestamp") or \
           str(d_schema.field(c).type).startswith("timestamp"):
            return f'CAST("{c}" AS TIMESTAMP) AS "{c}"'
        return f'"{c}"'
    cols = ", ".join(sel(c) for c in sorted(s_schema.names))
    for a, b, tag in ((f"SELECT {cols} FROM read_parquet('{spark_glob}')",
                       f"SELECT {cols} FROM __oracle", "spark-not-in-oracle"),
                      (f"SELECT {cols} FROM __oracle",
                       f"SELECT {cols} FROM read_parquet('{spark_glob}')",
                       "oracle-not-in-spark")):
        n_diff = con.execute(
            f"SELECT count(*) FROM ({a} EXCEPT ALL {b})").fetchone()[0]
        if n_diff:
            return f"FAIL {name}: {n_diff} rows {tag}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_glob = f"{out_dir}/{name}/*.parquet"
            n_spark = con.execute(
                f"SELECT count(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
            if n_spark > BIG_ROWS:
                err = check_big(con, name, sql, spark_glob, n_spark)
                if err:
                    print(err)
                    n_fail += 1
                else:
                    print(f"PASS {name} ({n_spark} rows, duckdb-side compare)")
                    n_pass += 1
                continue
            tbl = pq.read_table(f"{out_dir}/{name}")
            spark_cols = tbl.column_names
            spark_rows = [tuple(d[c] for c in spark_cols) for d in tbl.to_pylist()]
            duck_tbl = con.execute(sql).fetch_arrow_table()
            duck_cols = duck_tbl.column_names
            duck_rows = [tuple(d[c] for c in duck_cols) for d in duck_tbl.to_pylist()]
            # Driver hashes TYPED values: a DuckDB HUGEINT (int128) vs a
            # Spark BIGINT hash-mismatches even when values are equal.
            # Compare arrow types column-by-column to catch that class.
            type_errs = []
            for c in sorted(set(spark_cols) & set(duck_cols)):
                st = tbl.schema.field(c).type
                dt = duck_tbl.schema.field(c).type
                sn, dn = numclass(st), numclass(dt)
                if (sn or dn) and sn != dn:
                    type_errs.append(f"{c}: spark={st} duck={dt}")
            # Driver canonicalizer cannot sort/hash list columns (d02 class)
            for c in spark_cols:
                if str(tbl.schema.field(c).type).startswith(("list", "large_list")):
                    type_errs.append(f"{c}: list-typed column (driver canon crashes)")
            if type_errs:
                print(f"FAIL {name}: typed mismatch: {'; '.join(type_errs)}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = next(i for i in range(len(sr)) if sr[i] != dr[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
