#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script re-runs each oracle SQL in DuckDB over the same parquet
tables and compares row counts, sorted column names, and value hashes.

Gate fidelity (round-1 lesson, VERDICT.md "What's wrong" #1): the driver
reads the Spark parquet with pyarrow/pandas — DECIMAL columns arrive as
decimal.Decimal objects whose str() keeps trailing zeros ("1968.90") while
the DuckDB side arrives float64 ("1968.9"). Round 1's mimic normalized
floats to %.6g and reported 53/53 OK against a driver reporting 20 red.
This version normalizes with plain str() (no float folding) and reads the
Spark side with pandas.read_parquet, reproducing the driver's strictness:
re-run on the round-1 code it reports exactly the 20 driver failures."""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and v != v:  # NaN
        return "NULL"
    return str(v)

def df_hash(df):
    # sort columns by name, sort rows, hash values — like the driver
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
            got = pd.read_parquet(f"{out_dir}/{name}")
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
                # show first differing row (same sorted-normalized space)
                sa = sorted(tuple(norm(v) for v in r)
                            for r in got[gc].itertuples(index=False))
                sb = sorted(tuple(norm(v) for v in r)
                            for r in want[wc].itertuples(index=False))
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
