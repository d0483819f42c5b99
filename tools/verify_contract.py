"""Mirror of the round driver's correctness gate: run every queries() entry
and its oracle_sql() in DuckDB over sf0.01, compare rows/schema/values."""
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    only = set(sys.argv[1:])
    import __spark_entry__ as em
    from msi_preprocessing_pipeline_spark.session import build_session
    spark = build_session("verify", parallelism=16, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    ent = em.entry(spark)
    n = ent.count()
    print(f"entry(): {n} rows, schema ok", flush=True)

    oracles = em.oracle_sql()
    results = {}
    for name, fn in em.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            results[name] = f"SPARK-ERR {type(e).__name__}: {e}"
            print(f"{name}: SPARK-ERR {e}", flush=True)
            continue
        if name not in oracles:
            results[name] = f"no_oracle rows={len(sdf)}"
            print(f"{name}: no_oracle ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERR {type(e).__name__}: {e}"
            print(f"{name}: ORACLE-ERR {e}", flush=True)
            continue
        s, o = canon(sdf), canon(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        status = []
        if not rows:
            status.append(f"ROWS {len(s)} vs {len(o)}")
        if not schema:
            status.append(f"SCHEMA {list(s.columns)} vs {list(o.columns)}")
        hashm = None
        if rows and schema:
            dt_mismatch = [c for c in s.columns
                           if s[c].dtype != o[c].dtype]
            if dt_mismatch:
                status.append(
                    "DTYPE " + ",".join(f"{c}:{s[c].dtype}/{o[c].dtype}"
                                        for c in dt_mismatch))
            try:
                hashm = s.equals(o.astype(s.dtypes.to_dict()))
            except Exception:
                hashm = False
            if not hashm:
                status.append("HASH-FAIL")
        results[name] = "ok" if not status else "; ".join(status)
        print(f"{name}: {results[name]} ({time.time()-t0:.1f}s)", flush=True)

    bad = {k: v for k, v in results.items()
           if v != "ok" and not v.startswith("no_oracle")}
    print(json.dumps({"bad": bad, "n": len(results)}, default=str))
    out_path = os.environ.get("CONTRACT_OUT")
    if out_path and only:
        # a subset run must never clobber the full-coverage artifact
        print(f"CONTRACT_OUT ignored: subset run ({len(only)} queries)")
        out_path = None
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n": len(results),
                       "n_ok": sum(v == "ok" for v in results.values()),
                       "results": results}, f, indent=1, default=str)
    spark.stop()


if __name__ == "__main__":
    main()
