#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet in OUTDIR, run the oracle SQL from oracle_sql.json in DuckDB
against the same testdata tables, sort columns by name + rows by value,
and compare. Usage: check_correctness.py <sfDir> <outDir> [jsonOut]
With jsonOut, also write the driver-format per-query correctness JSON
(rows/schema/hash match booleans) for the round's *_local.json artifact."""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
report = {}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows)")
        report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                        "spark_rows": len(got), "oracle_rows": None, "err": "no_oracle"}
        continue
    exp = con.sql(oracle[name]).fetchdf()
    def norm(df):
        df = df[sorted(df.columns)]
        return sorted([tuple(str(v) for v in row) for row in df.itertuples(index=False)])
    g, e = norm(got), norm(exp)
    cols_match = sorted(got.columns) == sorted(exp.columns)
    report[name] = {"rows_match": len(g) == len(e), "schema_match": cols_match,
                    "hash_match": cols_match and g == e,
                    "spark_rows": len(g), "oracle_rows": len(e), "err": None}
    if cols_match and g == e:
        ok += 1
        print(f"{name}: OK ({len(g)} rows)")
    else:
        fail += 1
        print(f"{name}: MISMATCH cols_match={cols_match} rows {len(g)} vs {len(e)}")
        if not cols_match:
            print(f"   got cols: {sorted(got.columns)}\n   exp cols: {sorted(exp.columns)}")
        else:
            diff_g = [r for r in g if r not in e][:3]
            diff_e = [r for r in e if r not in g][:3]
            print(f"   only-in-got: {diff_g}\n   only-in-exp: {diff_e}")
print(f"\n{ok} OK, {fail} MISMATCH, {len([n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n)) and n not in oracle])} rows-only")
if json_out:
    with open(json_out, "w") as f:
        json.dump(dict(sorted(report.items())), f, indent=2)
    print(f"wrote {json_out}")
