#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (columns sorted by name,
rows sorted, exact values)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        bad.append((name, "missing spark output")); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetch_df()
        want = con.execute(sql).fetch_df()
    except Exception as e:
        bad.append((name, f"exec error: {e}")); continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        bad.append((name, f"cols {list(g.columns)} vs {list(w.columns)}")); continue
    if list(g.dtypes) != list(w.dtypes):
        bad.append((name, f"dtypes {list(zip(g.columns, g.dtypes, w.dtypes))}")); continue
    if len(g) != len(w):
        bad.append((name, f"rows {len(g)} vs {len(w)}")); continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    w = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    diff = (g != w) & ~(g.isna() & w.isna())
    if diff.any().any():
        idx = diff.any(axis=1)
        sample = g[idx].head(3).to_dict("records"), w[idx].head(3).to_dict("records")
        bad.append((name, f"{int(idx.sum())} differing rows; spark={sample[0]} oracle={sample[1]}"))
    else:
        ok.append(name)

for n in ok:
    print(f"OK    {n}")
for n, why in bad:
    print(f"FAIL  {n}: {why}")
print(f"\n{len(ok)}/{len(ok)+len(bad)} queries match")
sys.exit(1 if bad else 0)
