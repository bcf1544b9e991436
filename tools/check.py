#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate (dev tool only — the
shipped library has no Python dependency).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [names...]

1. Runs `sbt "runMain graft.Verify <sfdir> <outdir>"` (unless --skip-verify).
2. For each query parquet in outdir with an entry in oracle_sql.json, runs the
   SQL in DuckDB over views named after the corpus tables and compares:
   row count, column names (sorted), and values (rows sorted by all columns).
"""
import sys, os, json, subprocess, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
flags = sys.argv[3:]
skip_verify = "--skip-verify" in flags
only = [a for a in flags if not a.startswith("--")]

if not skip_verify:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
    if r.returncode != 0:
        print("VERIFY FAILED:\n" + tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon_type(t):
    """Canonical Arrow dtype string. Keeps genuinely different physical types
    distinct (int64 vs int128/double) — the driver's hasher is typed, so
    HUGEINT-vs-BIGINT must FAIL here even though Python coerces both to int."""
    s = str(t)
    return {"large_string": "string", "large_binary": "binary"}.get(s, s)

def arrow_types(sql):
    # LIMIT 0 subquery: the dtype probe needs only the schema — don't
    # re-execute the full oracle SQL / re-scan the parquet a second time.
    sch = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
    return {f.name: canon_type(f.type) for f in sch}

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)): return tuple(canon(x) for x in v)
    return v

def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out

fails = 0
names = only or sorted(oracle.keys())
for name in names:
    sql = oracle.get(name)
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails += 1; continue
    if sql is None:
        print(f"ok   {name}: rows-only ({len(grows)} rows)"); continue
    try:
        exp = con.execute(sql)
        ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    gc, gr = norm(gcols, grows)
    ec, er = norm(ecols, erows)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}"); fails += 1; continue
    # Typed comparison via Arrow: Python fetchall coerces e.g. DuckDB HUGEINT
    # and BIGINT both to int, but the driver hashes typed values — so compare
    # Arrow dtypes explicitly (this is what caught the r2 38/44-vs-44/44 gap).
    try:
        gtypes = arrow_types(f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
        etypes = arrow_types(sql)
        badt = {c: (gtypes.get(c), etypes.get(c)) for c in gc
                if gtypes.get(c) != etypes.get(c)}
        if badt:
            print(f"FAIL {name}: dtype mismatch (spark,oracle): {badt}")
            fails += 1; continue
    except Exception as e:
        print(f"WARN {name}: dtype check skipped: {e}")
    if len(gr) != len(er):
        print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}"); fails += 1; continue
    if gr != er:  # exact order-sensitive compare first
        if sorted(map(repr, gr)) == sorted(map(repr, er)):
            print(f"WARN {name}: values match but row ORDER differs"); continue
        diffs = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
        for i in diffs:
            print(f"     row {i}: spark={gr[i]} duck={er[i]}")
        print(f"FAIL {name}: {sum(1 for a,b in zip(gr,er) if a!=b)} differing rows")
        fails += 1; continue
    print(f"ok   {name}: {len(gr)} rows exact")
print(f"\n{len(names)-fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
