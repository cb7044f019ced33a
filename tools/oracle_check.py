#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script re-runs each oracle SQL in DuckDB over the same parquet
tables and compares row counts, sorted column names, and value hashes."""
import json, sys, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)

def df_hash(df):
    # sort columns by name, sort rows, hash values
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(norm(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(rows), cols

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            gh, gn, gc = df_hash(got)
            wh, wn, wc = df_hash(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} vs {wc}")
                fail += 1
            elif gn != wn:
                print(f"FAIL {name}: rows {gn} vs {wn}")
                fail += 1
            elif gh != wh:
                print(f"FAIL {name}: hash mismatch ({gn} rows)")
                # show first differing row
                a = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
                b = con.execute(sql).fetchall()
                sa = sorted(tuple(norm(v) for v in r) for r in a)
                sb = sorted(tuple(norm(v) for v in r) for r in b)
                for x, y in zip(sa, sb):
                    if x != y:
                        print(f"  spark : {x}\n  duckdb: {y}")
                        break
                fail += 1
            else:
                print(f"OK   {name} ({gn} rows)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
