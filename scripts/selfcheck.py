#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run graft.Verify at a
given SF dir, then replay each oracle_sql.json entry in DuckDB over the
same parquet tables and compare (column names, row count, values with
order-insensitive compare and float tolerance).

Usage: python3 scripts/selfcheck.py [sfDir] [outDir]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

if "--only" in sys.argv:
    sys.exit("use --only=<name>[,<name>...] (the space-separated form would be "
             "misread as the SF dir)")
argv = [a for a in sys.argv[1:] if a != "--no-run" and not a.startswith("--only")]
ONLY = next((a.split("=", 1)[1].split(",") for a in sys.argv if a.startswith("--only=")), None)
SF = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
OUT = Path(argv[1] if len(argv) > 1 else "/tmp/verify_out")


def canon(v):
    # Keep int vs float DISTINCT (tag by kind): the driver's hash compare
    # stringifies values, so a DuckDB HUGEINT->float64 3.0 against a Spark
    # long 3 is a hash mismatch even though Python's 3.0 == 3 is True.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("i", int(v))
    return v


def compare(name, sql, con):
    pq = OUT / name
    files = sorted(str(p) for p in pq.glob("*.parquet"))
    if not files:
        return f"FAIL {name}: no spark output"
    got = con.sql(f"SELECT * FROM read_parquet({files!r})")
    want = con.sql(sql)
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if [c.lower() for c in gcols] != [c.lower() for c in wcols]:
        return f"FAIL {name}: columns {gcols} vs {wcols}"
    # Per-column tolist() keeps each column's dtype (df.values would upcast
    # a mixed int/float frame to all-float64 and mask int-vs-float drift).
    gdf, wdf = got.df(), want.df()
    grows = list(zip(*[gdf[c].tolist() for c in gcols])) if gcols else []
    wrows = list(zip(*[wdf[c].tolist() for c in wcols])) if wcols else []
    if len(grows) != len(wrows):
        return f"FAIL {name}: rows {len(grows)} vs {len(wrows)}"
    gset = sorted([tuple(canon(v) for v in r) for r in grows], key=repr)
    wset = sorted([tuple(canon(v) for v in r) for r in wrows], key=repr)
    bad = sum(1 for a, b in zip(gset, wset) if a != b)
    if bad:
        ex = next((a, b) for a, b in zip(gset, wset) if a != b)
        return f"FAIL {name}: {bad}/{len(gset)} rows differ, e.g. {ex[0]} vs {ex[1]}"
    return f"OK   {name}: {len(gset)} rows"


def main():
    if "--no-run" not in sys.argv:
        filt = f" {','.join(ONLY)}" if ONLY else ""
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{filt}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)
    # with --no-run the OUT dir may not exist yet — say so cleanly
    # instead of tracebacking on the first path read
    if not OUT.exists():
        sys.exit(f"output dir {OUT} does not exist; run without --no-run first")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    if ONLY:
        # a typo'd name must not produce a vacuous ALL GREEN
        known = set(oracles) | {p.name for p in OUT.iterdir() if p.is_dir()}
        unknown = set(ONLY) - known
        if unknown:
            sys.exit(f"--only names not in the inventory: {sorted(unknown)}")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    if ONLY:
        oracles = {k: v for k, v in oracles.items() if k in ONLY}
    fails = 0
    for name in sorted(oracles):
        try:
            msg = compare(name, oracles[name], con)
        except Exception as e:
            msg = f"FAIL {name}: exception {e}"
        if msg.startswith("FAIL"):
            fails += 1
        print(msg)
    # queries with no oracle: rows-only smoke
    declared = {p.name for p in OUT.iterdir() if p.is_dir()}
    if ONLY:
        declared &= set(ONLY)
    for name in sorted(declared - set(oracles)):
        files = sorted(str(p) for p in (OUT / name).glob("*.parquet"))
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else -1
        status = "OK  " if n > 0 else "FAIL"
        if n <= 0:
            fails += 1
        print(f"{status} {name}: rows-only check, {n} rows")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
