#!/usr/bin/env python3
"""Determinism probe compare: two graft.Verify dumps (different core /
shuffle-partition counts) must be VALUE-identical per query after a
canonical row sort — including the rows-only outputs no oracle covers.
Raw parquet bytes are NOT comparable (coalesce(1), no global sort);
this compares sorted repr-exact values, the driver's own discipline.

Usage: python3 scripts/compare_dumps.py <dumpA> <dumpB> [query ...]
"""
import sys, os, glob, hashlib
import pandas as pd

a, b = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])


def canon(v):
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def hash_dir(qdir):
    files = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    if not files:
        return None, None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    cols = sorted(df.columns)
    h = hashlib.sha256()
    for ln in sorted(
            "|".join(canon(v) for v in r)
            for r in df[cols].itertuples(index=False, name=None)):
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), len(df)


names = sorted(n for n in os.listdir(a)
               if os.path.isdir(os.path.join(a, n))
               and (not only or n in only))
fails, ok = [], 0
for n in names:
    ha, ra = hash_dir(os.path.join(a, n))
    if not os.path.isdir(os.path.join(b, n)):
        fails.append((n, "missing in B"))
        continue
    hb, rb = hash_dir(os.path.join(b, n))
    if ha is None or hb is None:
        fails.append((n, "missing parquet"))
    elif ra != rb:
        fails.append((n, f"rows: {ra} vs {rb}"))
    elif ha != hb:
        fails.append((n, f"value hash differs ({ra} rows)"))
    else:
        ok += 1

print(f"OK: {ok} / {len(names)}")
if fails:
    print("FAILS:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("FAILS: none")
