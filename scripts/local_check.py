#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify's parquet
dumps + oracle_sql.json, runs each oracle in DuckDB over the same sf dir,
and diffs values exactly (rows sorted, columns sorted by name).

Usage: python3 scripts/local_check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    # Type-tagged + bit-exact: the driver hashes stringified values, so
    # 1 vs 1.0 and 0.0 vs -0.0 must NOT compare equal here (python == would
    # pass them and mask a driver hash mismatch).
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v.hex())
    if isinstance(v, int):
        return ("i", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return [c for c in sorted(cols)], out

fails = 0
for name in sorted(oracle):
    try:
        res = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_cols = [d[0] for d in res.description]
        got = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark result: {e}")
        fails += 1
        continue
    try:
        res = con.execute(oracle[name])
        exp_cols = [d[0] for d in res.description]
        exp = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    gc, g = canon_rows(got_cols, got)
    ec, e = canon_rows(exp_cols, exp)
    if gc != ec:
        print(f"FAIL {name}: schema mismatch spark={gc} oracle={ec}")
        fails += 1
        continue
    if len(g) != len(e):
        print(f"FAIL {name}: row count spark={len(g)} oracle={len(e)}")
        fails += 1
        continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:\n  spark : {a}\n  oracle: {b}\n  cols  : {gc}")
        fails += 1
    else:
        print(f"PASS {name}: {len(g)} rows")

# rows-only queries (no oracle): just report counts
import os
for d in sorted(os.listdir(outdir)):
    if d not in oracle and os.path.isdir(f"{outdir}/{d}"):
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{outdir}/{d}/*.parquet')").fetchone()[0]
            print(f"ROWS {d}: {n} rows (no oracle)")
        except Exception as ex:
            print(f"FAIL {d}: unreadable rows-only result: {ex}")
            fails += 1

sys.exit(1 if fails else 0)
