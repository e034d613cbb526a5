#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB-oracle correctness gate.

Dev tooling only (runs with the driver-side python libs; NOT part of the
shipped Scala library). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        spark_cols = tbl.column_names
        spark_rows = [tuple(r[c] for c in spark_cols) for r in tbl.to_pylist()]
        try:
            rel = con.sql(sql)
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
            # Driver-hash hazard: fetchall() erases physical types (HUGEINT
            # → python int), but the driver's hash is type-sensitive — a
            # DuckDB sum() (HUGEINT) vs a Spark bigint column hashes
            # differently even with equal values (q68 r6 regression). Warn
            # on any physical-type divergence from the Spark parquet.
            duck_types = {c.lower(): str(t) for c, t in zip(rel.columns, rel.types)}
            spark_types = {f.name.lower(): str(f.type) for f in tbl.schema}
            for c, dt in duck_types.items():
                st = spark_types.get(c, "?")
                pairs = {("hugeint", "int64"), ("integer", "int64"),
                         ("decimal", "double"), ("float", "double")}
                if any(dt.lower().startswith(a) and st == b for a, b in pairs):
                    print(f"WARN {name}.{c}: duck {dt} vs spark {st} — "
                          f"add an explicit ::CAST in the oracle")
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            print(f"FAIL {name}: schema {sorted(spark_cols)} vs {sorted(duck_cols)}")
            n_fail += 1
            continue
        a = rows_key([c.lower() for c in spark_cols], spark_rows)
        b = rows_key([c.lower() for c in duck_cols], duck_rows)
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(a)} spark vs {len(b)} duck rows")
            only_a = [r for r in a if r not in set(map(tuple, b))][:3]
            only_b = [r for r in b if r not in set(map(tuple, a))][:3]
            for r in only_a:
                print(f"   spark-only: {r}")
            for r in only_b:
                print(f"   duck-only:  {r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
