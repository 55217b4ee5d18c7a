#!/usr/bin/env python3
"""Dev utility mirroring the driver's correctness gate for ONE query:
load the Spark parquet result + run the oracle SQL in DuckDB over the
testdata tables, sort columns by name, compare row counts, schemas and
value multisets. Usage: compare_oracle.py <name> <sfDir> <outDir>"""
import sys, glob
import duckdb

name, sfdir, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    if glob.glob(f"{sfdir}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

spark = con.execute(
    f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
oracle_sql = open(f"{outdir}/{name}.oracle.sql").read()
oracle = con.execute(oracle_sql).fetchdf()

spark = spark.reindex(sorted(spark.columns), axis=1)
oracle = oracle.reindex(sorted(oracle.columns), axis=1)
print(f"rows: spark={len(spark)} oracle={len(oracle)} match={len(spark)==len(oracle)}")
print(f"cols: spark={list(spark.columns)} oracle={list(oracle.columns)}")

sk = spark.sort_values(by=list(spark.columns)).reset_index(drop=True)
ok = oracle.sort_values(by=list(oracle.columns)).reset_index(drop=True)
sk.columns = range(len(sk.columns)); ok.columns = range(len(ok.columns))
if len(sk) == len(ok) and list(map(str, sk.dtypes)) == list(map(str, ok.dtypes)):
    eq = sk.equals(ok)
    print("values match:", eq)
    if not eq:
        diff = (sk != ok) & ~(sk.isna() & ok.isna())
        rows = diff.any(axis=1)
        print("first diffs (spark vs oracle):")
        print(sk[rows].head(5))
        print(ok[rows].head(5))
else:
    print("dtype mismatch:", list(sk.dtypes), list(ok.dtypes))
