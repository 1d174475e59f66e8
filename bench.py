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


SCALING_DOCS = int(os.environ.get("KARGO_SCALING_DOCS", "8000"))
SCALING_WORDS = int(os.environ.get("KARGO_SCALING_WORDS", "400"))


def run_scaling() -> dict:
    """KG pipeline throughput at local[8] vs local[32] (the sandbox stand-in
    for N vs 4N executors — BASELINE.md protocol). The input is a
    compute-dominated synthetic corpus (SCALING_DOCS docs x SCALING_WORDS
    words) so the measurement reflects parallelizable work, not fixed
    driver/JVM overhead; efficiency = (docs/sec @ 4N) / (4 x docs/sec @ N)."""
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus,
                   KARGO_SHUFFLE_PARTITIONS=str(int(cpus) * 4))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pipeline-throughput"],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"no output at cpus={cpus}: {out.stderr[-2000:]}")
        results[cpus] = json.loads(lines[-1])
    r8 = results["8"]["docs_per_sec"]
    r32 = results["32"]["docs_per_sec"]
    eff = (r32 / (4 * r8)) if r8 else 0.0
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": SCALING_DOCS,
        "throughput_local8_docs_per_sec": r8,
        "throughput_local32_docs_per_sec": r32,
        "triples_per_sec_local32": results["32"]["triples_per_sec"],
        "detail": results,
    }


def run_pipeline_throughput() -> dict:
    """One pipeline run on the synthetic scaling corpus at local[$CPUS]:
    in-memory stage materialization (no parquet writes), tfidf ranker,
    relation clustering off (DBSCAN exact is deliberately single-group)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kargo_spark.pipeline import run_pipeline
    from kargo_spark.session import get_spark
    from kargo_spark.synth import synth_documents

    spark = get_spark(app_name="kargo_scaling", master=f"local[{CPUS}]")
    # tiny warm-up so JVM/Arrow/Python-worker startup is excluded
    warm = synth_documents(spark, n_rows=50)
    run_pipeline(spark, warm, None, ranker="tfidf", cluster_relations=False)
    docs = synth_documents(spark, n_rows=SCALING_DOCS, words_per_doc=SCALING_WORDS)
    docs = docs.repartition(int(CPUS) * 4).persist()
    n_docs = docs.count()
    t0 = time.time()
    out = run_pipeline(spark, docs, None, ranker="tfidf", cluster_relations=False)
    n_triples = out["triples"].count()
    dt = time.time() - t0
    return {
        "cpus": CPUS,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 2),
        "triples_per_sec": round(n_triples / dt, 2),
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
    elif "--pipeline-throughput" in sys.argv:
        print(json.dumps(run_pipeline_throughput()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
