"""Round-6 optimization helper bench (bench.py is FROZEN for measurement).

Times individual declared queries with the noop sink (guide §1.4) so the
computation is measured, not the driver-collect, and can dump
``.explain("formatted")`` for plan evidence (plans/r06/).

Usage:
    python bench_extra.py time QUERY [QUERY ...] [--reps N] [--sf DIR]
    python bench_extra.py plan QUERY [QUERY ...] [--out plans/r06] [--tag before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _session(cpus: int):
    from msi_preprocessing_pipeline_spark.session import build_session
    return build_session("bench-extra", parallelism=cpus,
                         shuffle_partitions=cpus)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plan"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r06"))
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    import __spark_entry__ as em
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark = _session(cpus)
    qs = em.queries()
    out: dict[str, object] = {}
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        if args.mode == "plan":
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            os.makedirs(args.out, exist_ok=True)
            p = os.path.join(args.out, f"{name}_{args.tag}.txt")
            with open(p, "w") as f:
                f.write(txt)
            print(f"{name}: plan -> {p} ({txt.count('Exchange')} Exchange, "
                  f"{txt.count('EvalPython') + txt.count('MapInPandas') + txt.count('MapInArrow')} py-nodes)",
                  flush=True)
            continue
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            (fn(spark, args.sf).write.format("noop")
             .mode("overwrite").save())
            reps.append(round(time.time() - t0, 3))
        out[name] = {"min": min(reps), "reps": reps}
        print(f"{name}: min={min(reps)} reps={reps}", flush=True)
    if args.mode == "time":
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
