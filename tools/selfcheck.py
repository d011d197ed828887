#!/usr/bin/env python3
"""Replicate the driver's correctness gate locally:
run each oracle_sql in DuckDB over the sf parquet tables, load the Verify
output parquet, and compare (rows, columns sorted by name, values).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, bool): return str(v).lower()
    return str(v)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got_rel = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'")
            got = got_rel.fetchall()
            got_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(want_cols)} spark={sorted(got_cols)}")
            failures += 1
            continue
        # driver semantics: sort columns by name, compare value multisets
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        w = sorted(tuple(norm(r[i]) for i in wi) for r in want)
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got)
        if w != g:
            print(f"FAIL {name}: {len(w)} oracle rows vs {len(g)} spark rows")
            for a, b in list(zip(w, g))[:200]:
                if a != b:
                    print(f"   oracle: {a}\n   spark : {b}")
                    break
            if len(w) != len(g):
                onlyw = [x for x in w if x not in set(g)][:3]
                onlyg = [x for x in g if x not in set(w)][:3]
                print(f"   only-oracle: {onlyw}\n   only-spark : {onlyg}")
            failures += 1
        else:
            print(f"OK   {name}: {len(w)} rows")
    # rows-only queries (no oracle): just report counts
    import os
    for d in sorted(os.listdir(out)):
        if d not in oracle and os.path.isdir(f"{out}/{d}"):
            try:
                n = con.execute(f"SELECT count(*) FROM '{out}/{d}/*.parquet'").fetchone()[0]
                print(f"ROWS {d}: {n}")
            except Exception as e:
                print(f"ROWS {d}: unreadable: {e}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
