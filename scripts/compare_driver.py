#!/usr/bin/env python3
"""Driver-identical DuckDB oracle compare (r15, VERDICT r14 task #2).

The r14 round closed with a green /tmp/compare.py but a RED driver gate:
the driver hashes PANDAS-dtyped frames (duckdb fetchdf / pyarrow->pandas),
so a DuckDB HUGEINT column (dtype object/float64) hash-diverges from a
Spark BIGINT (int64) even when every value is identical.  fetchall()-based
compares can't see that class.  This script can:

  1. Values: sort columns by name, canonicalize per-cell, sort rows,
     sha256 — the driver's compare, at BOTH 6-digit-rounded and
     repr-exact precision.
  2. Dtypes: the pandas dtype vector of the Spark dump (pyarrow ->
     pandas) must equal the oracle's fetchdf() dtype vector column by
     column.
  3. Convention: DESCRIBE every oracle; any HUGEINT/UHUGEINT/INT128
     output column is an error even if today's values fit — that is the
     exact r14 q_outliers failure class (SUM over INTEGER CASE arms
     widens to HUGEINT in DuckDB; always CAST(... AS BIGINT)).

Usage: python3 scripts/compare_driver.py <sfDir> <verifyOutDir> [query ...]
Exit 0 only if all three checks pass for every oracle-backed query.
"""
import sys, os, json, hashlib, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)


def canon(v, exact):
    if v is None or v != v:  # None or NaN
        return "NULL"
    if isinstance(v, float):
        return repr(v) if exact else f"{v:.6f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def hash_df(df, exact):
    cols = sorted(df.columns)
    h = hashlib.sha256()
    rows = df[cols].itertuples(index=False, name=None)
    for ln in sorted("|".join(canon(v, exact) for v in r) for r in rows):
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def dtype_vec(df):
    return {c: str(df[c].dtype) for c in df.columns}


fails, ok, skipped = [], 0, 0
for name in sorted(os.listdir(outdir)):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        continue
    if only and name not in only:
        continue
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        fails.append((name, "no spark dump"))
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                    ignore_index=True)
    if name not in oracles:
        skipped += 1
        print(f"  {name}: no_oracle rows={len(sdf)}")
        continue
    sql = oracles[name]
    try:
        # Convention check first: oracle result schema must be
        # HUGEINT-free (the driver-side pandas conversion for 128-bit
        # ints is what broke r14).
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        huge = [(c, t) for c, t, *_ in desc
                if "HUGEINT" in t.upper() or "INT128" in t.upper()]
        if huge:
            fails.append((name, f"oracle emits 128-bit ints {huge}; "
                                f"add CAST(... AS BIGINT)"))
            continue
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    if sorted(sdf.columns) != sorted(odf.columns):
        fails.append((name, f"schema: spark={sorted(sdf.columns)} "
                            f"oracle={sorted(odf.columns)}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows: spark={len(sdf)} oracle={len(odf)}"))
        continue
    sd, od = dtype_vec(sdf), dtype_vec(odf)
    # Harmless representation differences the driver tolerates:
    # DuckDB fetchdf renders DATE as datetime64, parquet as object/date;
    # both hash as their str() which compare.canon handles identically —
    # but int-vs-float or int-vs-object is exactly the r14 bug.
    KIND = {"int8": "i", "int16": "i", "int32": "i", "int64": "i",
            "uint8": "i", "uint16": "i", "uint32": "i", "uint64": "i",
            "float32": "f", "float64": "f", "bool": "b", "boolean": "b",
            "object": "o"}
    dmis = [c for c in sd
            if KIND.get(sd[c], sd[c]) != KIND.get(od[c], od[c])
            and not (sd[c].startswith("datetime") and
                     od[c].startswith("datetime"))]
    if dmis:
        fails.append((name, "dtype: " + ", ".join(
            f"{c} spark={sd[c]} oracle={od[c]}" for c in dmis)))
        continue
    bad = None
    for exact in (False, True):
        if hash_df(sdf, exact) != hash_df(odf, exact):
            bad = "repr-exact" if exact else "6-digit"
            break
    if bad:
        fails.append((name, f"hash mismatch ({bad}, {len(sdf)} rows)"))
    else:
        ok += 1

print(f"OK: {ok}  rows-only: {skipped}")
if fails:
    print("FAILS:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("FAILS: none")
