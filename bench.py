#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports triples/sec for the KG pipeline (the BASELINE.json headline
metric). Run with --scaling to additionally measure the same pipeline at
local[N] and local[4N] (subprocesses so the JVM core count is honest) and
report throughput scaling efficiency — evidence for the north-rule's
two-cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "tfidf_topk",
    "doc_frequency",
    "triples_agg",
    "precision_at_k",
    "minhash_neardup",
    "simhash_neardup",
    "ann_bruteforce",
    "lang_quality",
    "fingerprint",
    "sessionize",
    "kg_pipeline_triples",
]


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from kargo_spark.session import get_spark

    spark = get_spark(app_name="kargo_bench", master=f"local[{CPUS}]")
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        if name == "kg_pipeline_triples":
            extra["triples"] = n
            extra["triples_per_sec"] = round(n / dt, 2)
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extra,
    }


def run_scaling() -> dict:
    """Same KG pipeline at two parallelism levels; efficiency =
    (rows/sec @ 4N) / (4 x rows/sec @ N)."""
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=SF_DIR,
                   KARGO_BENCH_ONLY="kg_pipeline_triples")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", "kg_pipeline_triples"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8 = results["8"]["rows_per_sec"]
    r32 = results["32"]["rows_per_sec"]
    eff = (r32 / (4 * r8)) if r8 else 0.0
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "throughput_local8_rows_per_sec": r8,
        "throughput_local32_rows_per_sec": r32,
        "sf": SF_DIR,
    }


def run_single(name: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from kargo_spark.session import get_spark

    spark = get_spark(app_name=f"kargo_bench_{name}", master=f"local[{CPUS}]")
    fn = entrymod.queries()[name]
    # warm the JVM/Arrow path once on tiny data so we measure compute
    fn(spark, "/root/testdata/sf0.001").count()
    t0 = time.time()
    df = fn(spark, SF_DIR)
    n = df.count()
    dt = time.time() - t0
    return {"query": name, "rows": n, "sec": round(dt, 3),
            "rows_per_sec": round(n / dt, 2), "cpus": CPUS}


if __name__ == "__main__":
    if "--single" in sys.argv:
        print(json.dumps(run_single(sys.argv[sys.argv.index("--single") + 1])))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
