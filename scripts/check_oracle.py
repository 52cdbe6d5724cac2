#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfdir> <outdir>

Reads <outdir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB with views named after the parquet tables in <sfdir>, loads the
corresponding <outdir>/<name>/ parquet written by Spark, and compares:
  - column-name sets
  - row counts
  - values, rows sorted by all columns, cols sorted by name:
      exact match, and a tolerant (1e-9 rel) float match
Exit code 0 iff every query matches exactly.
"""
import json, math, sys, glob, os

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl.to_pylist()


def norm_rows(rows):
    out = []
    for r in rows:
        out.append({k.lower(): v for k, v in r.items()})
    return out


def key(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, str(v))
    if isinstance(v, (int, float)):
        return (2, float(v))
    return (3, str(v))


def canon(rows):
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    mat = [[r[c] for c in cols] for r in rows]
    mat.sort(key=lambda row: [key(v) for v in row])
    return cols, mat


def eq(a, b, tol):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if tol == 0:
            return fa == fb
        return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_rows = load_spark(outdir, name)
        if spark_rows is None:
            print(f"[{name}] FAIL: no spark output")
            failures += 1
            continue
        try:
            res = con.execute(sql)
            cols = [d[0].lower() for d in res.description]
            duck_rows = [dict(zip(cols, row)) for row in res.fetchall()]
        except Exception as e:
            print(f"[{name}] FAIL: duckdb error: {e}")
            failures += 1
            continue
        s = norm_rows(spark_rows)
        d = norm_rows(duck_rows)
        if not s and not d:
            print(f"[{name}] OK (both empty)")
            continue
        sc = sorted(s[0].keys()) if s else []
        dc = sorted(d[0].keys()) if d else []
        if sc != dc:
            print(f"[{name}] FAIL: columns spark={sc} duck={dc}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"[{name}] FAIL: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        _, sm = canon(s)
        _, dm = canon(d)
        exact = all(eq(a, b, 0) for ra, rb in zip(sm, dm) for a, b in zip(ra, rb))
        tol = all(eq(a, b, 1e-9) for ra, rb in zip(sm, dm) for a, b in zip(ra, rb))
        if exact:
            print(f"[{name}] OK exact ({len(s)} rows)")
        elif tol:
            print(f"[{name}] WARN tolerant-only match ({len(s)} rows) — driver hash may fail")
            for ra, rb in zip(sm, dm):
                for c, (a, b) in zip(sc, zip(ra, rb)):
                    if not eq(a, b, 0):
                        print(f"    {c}: spark={a!r} duck={b!r}")
                        break
            failures += 1
        else:
            print(f"[{name}] FAIL: value mismatch")
            shown = 0
            for ra, rb in zip(sm, dm):
                if shown >= 3:
                    break
                if ra != rb:
                    print(f"    spark={ra}")
                    print(f"    duck ={rb}")
                    shown += 1
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
