#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet result, runs the matching SQL from
oracle_sql.json in DuckDB (tables registered as views over <sfDir>/*.parquet),
and compares: schema (column names), row count, result TYPES (rendered-value
classes — the driver hashes rendered values, so BIGINT 5302816 vs DOUBLE
5302816.0 is a driver FAIL even though == passes; r8 shipped its one red
cell through exactly that blind spot), and values (columns sorted by name,
rows compared in order, exact equality; floats compared bitwise-with
tiny-tolerance report).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa
import pyarrow.types as pt


def tclass(t):
    """Canonical rendered-type class. Two columns whose classes differ can
    render the same numeric value differently (int 5 vs float 5.0), which
    the driver's value-hash catches — so the local gate must too. Integer
    widths collapse (int32 42 renders like int64 42); decimals keep their
    scale (scale changes the rendered string: 12.3 vs 12.30)."""
    if pt.is_integer(t): return ("int",)
    if pt.is_floating(t): return ("float",)
    if pt.is_decimal(t): return ("decimal", t.scale)
    if pt.is_boolean(t): return ("bool",)
    if pt.is_string(t) or pt.is_large_string(t): return ("string",)
    if pt.is_date(t): return ("date",)
    if pt.is_timestamp(t): return ("timestamp",)
    if pt.is_time(t): return ("time",)
    if pt.is_binary(t) or pt.is_large_binary(t): return ("binary",)
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return ("list", tclass(t.value_type))
    if pt.is_struct(t):
        return ("struct", tuple((f.name, tclass(f.type)) for f in t))
    if pt.is_map(t):
        return ("map", tclass(t.key_type), tclass(t.item_type))
    return ("other", str(t))

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def load_result(d):
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    t = pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in sorted(files)])
    return t

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    names = sorted([n for n in os.listdir(out)
                    if os.path.isdir(os.path.join(out, n))])
    n_pass = n_fail = n_noorc = 0
    for name in names:
        try:
            spark_t = load_result(os.path.join(out, name))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}"); n_fail += 1; continue
        if name not in oracles:
            print(f"---- {name}: no oracle ({spark_t.num_rows} rows)"); n_noorc += 1; continue
        try:
            duck_t = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sc = sorted(spark_t.column_names); dc = sorted(duck_t.column_names)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if spark_t.num_rows != duck_t.num_rows:
            print(f"FAIL {name}: rows spark={spark_t.num_rows} duck={duck_t.num_rows}"); n_fail += 1; continue
        tbad = None
        for cname in sc:
            ts = tclass(spark_t.schema.field(cname).type)
            td = tclass(duck_t.schema.field(cname).type)
            if ts != td:
                tbad = (cname, spark_t.schema.field(cname).type,
                        duck_t.schema.field(cname).type)
                break
        if tbad:
            print(f"FAIL {name}: type mismatch col={tbad[0]} "
                  f"spark={tbad[1]} duck={tbad[2]} (driver hashes rendered "
                  f"values — cross-class numeric equality does NOT pass)")
            n_fail += 1; continue
        bad = None
        for cname in sc:
            a = spark_t.column(cname).to_pylist()
            b = duck_t.column(cname).to_pylist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x == y: continue
                if x is None or y is None:
                    bad = (cname, i, x, y); break
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y): continue
                    bad = (cname, i, x, y, abs(x - y)); break
                bad = (cname, i, x, y); break
            if bad: break
        if bad:
            print(f"FAIL {name}: first diff col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}"
                  + (f" absdiff={bad[4]:.3e}" if len(bad) > 4 else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_t.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noorc} no-oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
