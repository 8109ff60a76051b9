#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: schema (arrow types after sorting columns by name), row count, and
exact cell values. Floats are compared bit-exact — queries must be written to
be deterministic (see QueryDef.dsum).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return ("f", v)
    return v

def table_rows(t: pa.Table):
    cols = sorted(t.column_names)
    t = t.select(cols)
    rows = [tuple(norm(c) for c in r) for r in zip(*[t.column(c).to_pylist() for c in cols])]
    return cols, [str(t.schema.field(c).type) for c in cols], rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = sorted(d for d in os.listdir(outdir)
                     if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_noracle = 0
    # the round-5 failure mode: a query that errors must not VANISH from the
    # artifact. Verify writes _ERROR.txt markers per failure, and
    # attempted.json (the exact intended set, written BEFORE queries run) —
    # anything attempted but absent means the dump died mid-run.
    present = set(results)
    attempted_path = os.path.join(outdir, "attempted.json")
    attempted = set(json.load(open(attempted_path))) if os.path.exists(attempted_path) \
        else (set(oracle) if len(present) >= 0.9 * len(oracle) else present)
    for name in sorted(attempted - present):
        print(f"FAIL {name}: attempted but no output dir"); n_fail += 1
    for name in results:
        marker = os.path.join(outdir, name, "_ERROR.txt")
        if os.path.exists(marker):
            msg = open(marker).read().strip().splitlines()
            print(f"FAIL {name}: ERR {msg[0] if msg else ''}"); n_fail += 1; continue
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        if name not in oracle:
            status = "rows-only" + (" OK" if got.num_rows > 0 else " EMPTY!")
            print(f"---- {name}: {status} ({got.num_rows} rows)")
            n_noracle += 1
            continue
        try:
            exp = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        gc, gt, gr = table_rows(got)
        ec, et, er = table_rows(exp)
        ok = True
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); ok = False
        elif gt != et:
            print(f"WARN {name}: dtypes {gt} != {et}")
        if ok and len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}"); ok = False
        if ok:
            if sorted(map(repr, gr)) != sorted(map(repr, er)):
                bad = [(a, b) for a, b in zip(sorted(map(repr, gr)), sorted(map(repr, er))) if a != b]
                print(f"FAIL {name}: {len(bad)} differing rows; first: {bad[0] if bad else '??'}")
                ok = False
            elif list(map(repr, gr)) != list(map(repr, er)):
                # values match as multisets but row ORDER differs — the
                # driver may compare order-sensitively, so treat as failure
                print(f"FAIL {name}: row order differs from oracle")
                ok = False
        if ok:
            empty = " (EMPTY!)" if len(gr) == 0 else ""
            print(f"PASS {name} ({len(gr)} rows){empty}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
