#!/usr/bin/env python
"""Stage-level decomposition of the scaling pipeline at a given core count
(r05 verdict next-step #2: locate the 8->32 straggler stage instead of
arguing from aggregates).

Runs ONE triples_chain pass over the synthetic scaling corpus at
local[$SPARK_GRAFT_CPUS] with the Spark UI enabled, then prints per-stage
rows from the REST API: executor run time, wall (submit->complete), task
count, and the straggler signature — max vs median task duration. Run it
under taskset and compare the same stages across widths:

  taskset -c 0-7  env SPARK_GRAFT_CPUS=8  KARGO_SHUFFLE_PARTITIONS=32 \
      python tools/stage_decomp.py
  taskset -c 0-31 env SPARK_GRAFT_CPUS=32 KARGO_SHUFFLE_PARTITIONS=128 \
      python tools/stage_decomp.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_DOCS = int(os.environ.get("KARGO_SCALING_DOCS", "100000"))
WORDS = int(os.environ.get("KARGO_SCALING_WORDS", "400"))


def _ts(x: str) -> float:
    return datetime.strptime(
        x.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


def main() -> None:
    from pyspark.sql import SparkSession

    shuffle_parts = os.environ.get("KARGO_SHUFFLE_PARTITIONS", str(int(CPUS) * 4))
    spark = (
        SparkSession.builder.appName(f"stage_decomp_{CPUS}")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("KARGO_ARROW_MAX_RECORDS", "2048"),
        )
        .config("spark.ui.enabled", "true")
        .config("spark.local.dir", "/dev/shm/kargo_decomp")
        .config("spark.driver.memory", "24g")
        .config("spark.executorEnv.PYTHONPATH",
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from kargo_spark.pipeline import triples_chain
    from kargo_spark.synth import synth_documents

    # warm-up excludes JVM/Arrow startup, as in bench.py
    t, cached = triples_chain(synth_documents(spark, n_rows=50))
    t.count()
    [c.unpersist() for c in cached]

    docs = synth_documents(
        spark, n_rows=N_DOCS, words_per_doc=WORDS, distinct_paths=True
    ).repartition(int(CPUS) * 4).persist()
    docs.count()

    app = json.load(
        urllib.request.urlopen("http://localhost:4040/api/v1/applications")
    )[0]["id"]
    pre = {
        s["stageId"]
        for s in json.load(urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app}/stages"))
    }
    t0 = time.time()
    triples, cached = triples_chain(docs)
    n = triples.count()
    wall = time.time() - t0
    [c.unpersist() for c in cached]

    stages = [
        s for s in json.load(urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app}/stages"
            "?status=complete&withSummaries=true"
            "&quantiles=0.0,0.5,1.0"))
        if s["stageId"] not in pre
    ]
    stages.sort(key=lambda s: s["stageId"])
    base = min(_ts(s["submissionTime"]) for s in stages)
    rows = []
    print(json.dumps({"cpus": CPUS, "n_docs": N_DOCS, "n_triples": n,
                      "wall_sec": round(wall, 2),
                      "shuffle_partitions": shuffle_parts,
                      "loadavg_1m": round(os.getloadavg()[0], 1)}))
    hdr = (f"{'id':>4} {'tasks':>5} {'wall':>6} {'run':>7} "
           f"{'taskMed':>7} {'taskMax':>7} {'tail':>5}  site")
    print(hdr)
    for s in stages:
        try:
            sub = _ts(s["submissionTime"]); comp = _ts(s["completionTime"])
        except KeyError:
            continue
        q = (s.get("taskMetricsDistributions") or {}).get("executorRunTime")
        med = q[1] / 1000 if q else None
        mx = q[2] / 1000 if q else None
        tail = round(mx / med, 1) if q and med and med > 0 else None
        rows.append({
            "stage": s["stageId"], "tasks": s["numTasks"],
            "wall": round(comp - sub, 2),
            "run": round(s["executorRunTime"] / 1000, 2),
            "task_med_s": round(med, 2) if med is not None else None,
            "task_max_s": round(mx, 2) if mx is not None else None,
            "tail_ratio": tail,
            "t": [round(sub - base, 2), round(comp - base, 2)],
        })
        print(f"{s['stageId']:>4} {s['numTasks']:>5} {comp-sub:>6.2f} "
              f"{s['executorRunTime']/1000:>7.2f} "
              f"{(med if med is not None else -1):>7.2f} "
              f"{(mx if mx is not None else -1):>7.2f} "
              f"{(tail if tail is not None else -1):>5}  "
              f"{s['name'].splitlines()[0][:38]}")
    out = os.environ.get("KARGO_DECOMP_OUT")
    if out:
        with open(out, "a") as fh:
            fh.write(json.dumps({
                "cpus": CPUS, "n_docs": N_DOCS, "wall_sec": round(wall, 2),
                "shuffle_partitions": shuffle_parts, "stages": rows,
            }) + "\n")


if __name__ == "__main__":
    main()
