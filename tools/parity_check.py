#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/parity_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching oracle SQL from oracle_sql.json in DuckDB over the parquet
tables in <sfDir>. Compares schema (column names sorted), row count,
and values (columns sorted by name, exact match; floats exact — the
corpus routes double aggregation through DECIMAL(38,6) so exactness is
expected).
"""
import sys, os, json, glob, time
import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    produced = {os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
                if os.path.isdir(p)}
    for name in sorted(produced | set(oracles)):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            results[name] = f"SPARK-READ-ERR {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({got.num_rows} rows)"
            continue
        try:
            # progress + per-oracle timing on stderr as we go (the
            # summary prints only at the end; a multi-minute oracle
            # was otherwise indistinguishable from a hang)
            t0 = time.time()
            print(f"[oracle] {name} ...", file=sys.stderr, flush=True)
            exp = con.execute(oracles[name]).fetch_arrow_table()
            print(f"[oracle] {name} {time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = f"ORACLE-ERR {str(e)[:200]}"
            continue
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            results[name] = f"SCHEMA-MISMATCH spark={g_cols} oracle={e_cols}"
            continue
        if got.num_rows != exp.num_rows:
            results[name] = f"ROWCOUNT-MISMATCH spark={got.num_rows} oracle={exp.num_rows}"
            continue
        # The driver hash is ARROW-TYPE-sensitive (kv30/kv31, kv50:
        # DuckDB widens integral sums to HUGEINT/decimal128(38,0) while
        # Spark returns BIGINT; values compare equal in Python because
        # Decimal('14646') == 14646). Compare the arrow types per
        # column, not just the names, so the local mirror fails exactly
        # where the driver would.
        g_types = {f.name: f.type for f in got.schema}
        e_types = {f.name: f.type for f in exp.schema}
        badt = [(c, g_types[c], e_types[c]) for c in g_cols
                if g_types[c] != e_types[c]
                # timestamp tz naming differs benignly across writers
                and not (pa.types.is_timestamp(g_types[c])
                         and pa.types.is_timestamp(e_types[c]))]
        if badt:
            c, gt, et = badt[0]
            results[name] = f"TYPE-MISMATCH {c}: spark={gt} oracle={et}"
            continue
        gd = got.select(g_cols).to_pylist()
        ed = exp.select(e_cols).to_pylist()
        if gd == ed:
            results[name] = f"OK ({got.num_rows} rows)"
        else:
            bad = next(i for i, (a, b) in enumerate(zip(gd, ed)) if a != b)
            results[name] = f"VALUE-MISMATCH first@{bad}: spark={gd[bad]} oracle={ed[bad]}"

    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name, v in sorted(results.items()):
        mark = "  " if v.startswith(("OK", "rows-only")) else "✗ "
        print(f"{mark}{name}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
