"""Driver-sim correctness sweep: bare SparkSession (not our session
factory — catches session-conf assumptions), every registered query at
sf0.01, DuckDB oracle side-by-side, canonicalized the way the external
harness does it (columns sorted by name, rows sorted by ALL columns
via pandas sort_values, then a value hash). Exits non-zero on any
mismatch or canonicalizer crash (e.g. an unsortable array column).

Usage: python tools/oracle_sweep.py  (~3 min at sf0.01)"""
import json
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import os

# default matches the driver's correctness gate; override for the
# multi-SF pass (scale-dependent constants hide at other SFs)
SF = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def vhash(pdf: pd.DataFrame) -> str:
    # round floats to tame engine noise like the driver does (4dp-ish);
    # we hash repr of rounded values
    def cell(v):
        if isinstance(v, float):
            return f"{v:.4f}"
        return repr(v)

    import hashlib

    h = hashlib.md5()
    for row in pdf.itertuples(index=False):
        h.update("|".join(cell(v) for v in row).encode())
    return h.hexdigest()


def main():
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    queries = em.queries()
    oracles = em.oracle_sql()
    if len(sys.argv) > 1:  # optional name filter(s) for quick iteration
        queries = {k: v for k, v in queries.items() if k in sys.argv[1:]}
    results = {}
    fails = []
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                sc, oc = canon(sdf), canon(odf)
                rows = len(sc) == len(oc)
                schema = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
                hm = vhash(sc) == vhash(oc)
                results[name] = {"rows": rows, "schema": schema, "hash": hm,
                                 "n": len(sc), "sec": round(time.perf_counter() - t0, 2)}
                if not (rows and schema and hm):
                    fails.append(name)
            else:
                canon(sdf)  # must not crash the canonicalizer
                results[name] = {"rows_only": True, "n": len(sdf),
                                 "sec": round(time.perf_counter() - t0, 2)}
        except Exception as exc:
            results[name] = {"err": str(exc)[:300]}
            fails.append(name)
        r = results[name]
        print(f"{name}: {r}", flush=True)
    print(json.dumps({"n_queries": len(queries), "fails": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
