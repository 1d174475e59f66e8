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

# r05 renames (contract consolidation to 50 driver-visible keys):
# precision_at_k -> eval_suite (+ relative_recall), lang_quality +
# fingerprint -> textstats_suite (+ token_counts), sessionize ->
# events_suite (+ events_window). Suite timings therefore cover a
# superset of the former standalone queries' work.
HEADLINE = [
    "yake_topk",
    "tfidf_topk",
    "doc_frequency",
    "triples_agg",
    "eval_suite",
    "minhash_neardup",
    "simhash_neardup",
    "ann_bruteforce",
    "textstats_suite",
    "repetition_stats",
    "decontaminate",
    "events_suite",
    "kg_pipeline_triples",
]


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from kargo_spark.session import get_spark

    spark = get_spark(app_name="kargo_bench", master=f"local[{CPUS}]")
    queries = entrymod.queries()
    # warm the JVM / codegen / Arrow-worker path on tiny data so the first
    # timed query measures compute, not session startup (~5-10s per cold
    # plan shape on this host)
    for name in HEADLINE:
        queries[name](spark, "/root/testdata/sf0.001").count()
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    # min over KARGO_BENCH_REPS passes per query: this host is shared and
    # another tenant's bursts land MID-RUN (single-pass outliers of 4-5x
    # were observed at 1-min loadavg < 1) — the minimum is the least-
    # interfered measurement of the same deterministic plan
    reps = int(os.environ.get("KARGO_BENCH_REPS", "2"))
    for name in HEADLINE:
        fn = queries[name]
        best, n = None, 0
        for _ in range(reps):
            # drop plan-matched cache entries left by a previous pass of
            # the same query (CacheManager matches canonicalized plans, so
            # a rerun of a query that persists internally would otherwise
            # measure cache hits, not the pipeline)
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        if name == "kg_pipeline_triples":
            extra["triples"] = n
            extra["triples_per_sec"] = round(n / best, 2)
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
SCALING_N = os.environ.get("KARGO_SCALING_N", "4")         # N cores
SCALING_4N = os.environ.get("KARGO_SCALING_4N", "16")      # 4N cores
SCALING_REPS = int(os.environ.get("KARGO_SCALING_REPS", "3"))


def run_scaling() -> dict:
    """KG pipeline throughput at local[N] vs local[4N] (the sandbox
    stand-in for N vs 4N executors — BASELINE.md protocol). The input is a
    compute-dominated synthetic corpus (SCALING_DOCS docs x SCALING_WORDS
    words) so the measurement reflects parallelizable work, not fixed
    driver/JVM overhead; efficiency = (docs/sec @ 4N) / (4 x docs/sec @ N).

    This sandbox host is SHARED (external load varies) — each config runs
    SCALING_REPS times and the fastest run is kept (min wall = least
    interference); the 1-minute load average is recorded per rep so a
    polluted measurement is visible in the artifact.
    """
    max_load = float(os.environ.get("KARGO_SCALING_MAX_LOAD", "6"))
    max_wait = float(os.environ.get("KARGO_SCALING_MAX_WAIT_SEC", "600"))

    def _pin(cpus: str) -> list[str]:
        # cgroup-faithful simulation of an N-core executor: without pinning,
        # "local[N]" leaks past N CPUs (GC/netty/Python workers), making the
        # small config an unfair baseline
        return ["taskset", "-c", f"0-{int(cpus) - 1}"]

    def _wait_quiet() -> None:
        waited = 0.0
        while os.getloadavg()[0] > max_load and waited < max_wait:
            time.sleep(15)
            waited += 15

    results = {}
    for cpus in (SCALING_N, SCALING_4N):
        reps = []
        for _ in range(SCALING_REPS):
            _wait_quiet()
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus,
                       KARGO_SHUFFLE_PARTITIONS=str(int(cpus) * 4))
            out = subprocess.run(
                _pin(cpus) + [sys.executable, os.path.abspath(__file__), "--pipeline-throughput"],
                env=env, capture_output=True, text=True, timeout=3000,
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"no output at cpus={cpus}: {out.stderr[-2000:]}")
            rep = json.loads(lines[-1])
            rep["loadavg_1m"] = round(os.getloadavg()[0], 1)
            reps.append(rep)
        best = min(reps, key=lambda r: r["sec"])
        best["all_secs"] = [r["sec"] for r in reps]
        best["all_loads"] = [r["loadavg_1m"] for r in reps]
        results[cpus] = best
    # hardware calibration: the best any Spark JVM workload scales on this
    # host (whole-stage-codegen sum over range, same pinning) — the ceiling
    # against which pipeline efficiency should be judged on this VM
    calib = {}
    for cpus in (SCALING_N, SCALING_4N):
        _wait_quiet()
        out = subprocess.run(
            _pin(cpus) + [sys.executable, os.path.abspath(__file__), "--jvm-calibration"],
            env=dict(os.environ, SPARK_GRAFT_CPUS=cpus),
            capture_output=True, text=True, timeout=600,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        calib[cpus] = json.loads(lines[-1]) if lines else {"sec": None}
    rn = results[SCALING_N]["docs_per_sec"]
    r4n = results[SCALING_4N]["docs_per_sec"]
    eff = (r4n / (4 * rn)) if rn else 0.0
    c_n, c_4n = calib[SCALING_N].get("sec"), calib[SCALING_4N].get("sec")
    jvm_ceiling = round((c_n / c_4n) / 4, 3) if c_n and c_4n else None
    return {
        "metric": f"scaling_efficiency_{SCALING_N}_to_{SCALING_4N}",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": SCALING_DOCS,
        f"throughput_local{SCALING_N}_docs_per_sec": rn,
        f"throughput_local{SCALING_4N}_docs_per_sec": r4n,
        f"triples_per_sec_local{SCALING_4N}": results[SCALING_4N]["triples_per_sec"],
        "jvm_scaling_ceiling_on_this_host": jvm_ceiling,
        "efficiency_normalized_to_jvm_ceiling": round(eff / jvm_ceiling, 3) if jvm_ceiling else None,
        "detail": results,
        "calibration": calib,
    }


def run_scaling_multi() -> dict:
    """Cross-pairing scaling evidence (r04 verdict next-step #6): measure
    the SAME 100k-doc-class pipeline once per core count in
    KARGO_SCALING_CONFIGS (default 2,4,8,16,32 — each config shared by
    every pairing that uses it), then report ALL of 2->8, 4->16, 8->32
    with min AND median throughput plus the per-rep load record, so the
    headline >= 0.8 claim is checkable on medians, not just cherry-pickable
    mins. Superlinear raw ratios (possible on a shared host when the
    small config caught interference) are visible as median/min spread
    rather than silently reported.

    Each completed rep is checkpointed to KARGO_SCALING_LOG (JSONL) the
    moment it finishes, and a rerun resumes from that log — a multi-hour
    measurement survives the driver process dying (which is exactly how
    the first round-5 attempt lost its run)."""
    max_load = float(os.environ.get("KARGO_SCALING_MAX_LOAD", "6"))
    max_wait = float(os.environ.get("KARGO_SCALING_MAX_WAIT_SEC", "600"))
    configs = [
        c.strip()
        for c in os.environ.get("KARGO_SCALING_CONFIGS", "2,4,8,16,32").split(",")
    ]
    pairings = [
        tuple(p.split(":"))
        for p in os.environ.get("KARGO_SCALING_PAIRINGS", "2:8,4:16,8:32").split(",")
    ]

    def _wait_quiet() -> None:
        waited = 0.0
        while os.getloadavg()[0] > max_load and waited < max_wait:
            time.sleep(15)
            waited += 15

    def _median(xs):
        s = sorted(xs)
        k = len(s) // 2
        return s[k] if len(s) % 2 else 0.5 * (s[k - 1] + s[k])

    log_path = os.environ.get("KARGO_SCALING_LOG", "")
    resumed: dict[str, list] = {}
    if log_path and os.path.exists(log_path):
        with open(log_path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rep = json.loads(line)
                # only reuse reps measured on the same corpus definition
                if rep.get("n_docs") == SCALING_DOCS:
                    resumed.setdefault(str(rep["cpus"]), []).append(rep)

    results = {}
    for cpus in configs:
        reps = resumed.get(cpus, [])[:SCALING_REPS]
        while len(reps) < SCALING_REPS:
            _wait_quiet()
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus,
                       KARGO_SHUFFLE_PARTITIONS=str(int(cpus) * 4))
            out = subprocess.run(
                ["taskset", "-c", f"0-{int(cpus) - 1}", sys.executable,
                 os.path.abspath(__file__), "--pipeline-throughput"],
                env=env, capture_output=True, text=True, timeout=3000,
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"no output at cpus={cpus}: {out.stderr[-2000:]}")
            rep = json.loads(lines[-1])
            rep["loadavg_1m"] = round(os.getloadavg()[0], 1)
            reps.append(rep)
            if log_path:
                with open(log_path, "a") as fh:
                    fh.write(json.dumps(rep) + "\n")
        results[cpus] = {
            "secs": [r["sec"] for r in reps],
            "loads": [r["loadavg_1m"] for r in reps],
            # "min" = the min-WALL rep (max throughput, least interference)
            "min_docs_per_sec": max(r["docs_per_sec"] for r in reps),
            "median_docs_per_sec": round(
                reps[0]["n_docs"] / _median([r["sec"] for r in reps]), 2
            ),
            "triples": reps[0]["n_triples"],
            "triples_identical_across_reps": len({r["n_triples"] for r in reps}) == 1,
        }
    pair_rows = []
    for lo, hi in pairings:
        factor = int(hi) / int(lo)
        row = {
            "pairing": f"{lo}->{hi}",
            "factor": factor,
            "eff_min": round(
                results[hi]["min_docs_per_sec"]
                / (factor * results[lo]["min_docs_per_sec"]), 3),
            "eff_median": round(
                results[hi]["median_docs_per_sec"]
                / (factor * results[lo]["median_docs_per_sec"]), 3),
        }
        pair_rows.append(row)
    return {
        "metric": "scaling_efficiency_multi",
        "value": min(r["eff_median"] for r in pair_rows),
        "unit": "ratio",
        "n_docs": SCALING_DOCS,
        "pairings": pair_rows,
        "detail": results,
        "triples_identical_across_configs": len(
            {r["triples"] for r in results.values()}
        ) == 1,
    }


def run_jvm_calibration() -> dict:
    """Whole-stage-codegen hash+sum over range at local[$CPUS]: the purest
    parallel Spark JVM workload — its 4N/N speedup is this host's ceiling."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.local.dir", "/dev/shm/kargo_calib")
        .getOrCreate()
    )
    spark.range(10**6).select(F.sum(F.xxhash64("id"))).collect()
    t0 = time.time()
    spark.range(4 * 10**9).select(
        F.sum(F.xxhash64(F.col("id"), F.col("id") + 1, F.col("id") * 3))
    ).collect()
    return {"cpus": CPUS, "sec": round(time.time() - t0, 3)}


def _lazy_triples(spark, docs):
    """One-DAG triple chain (kargo_spark.pipeline.triples_chain): the
    measurement is real multi-stage throughput, not per-stage barriers.
    Returns (triples, cached) — callers must unpersist the cached handles
    after the terminal action, or repeated scaling-bench invocations in
    one session accumulate cached blocks and skew later measurements
    under memory pressure (r02 ADVICE low #5)."""
    from kargo_spark.pipeline import triples_chain

    return triples_chain(docs)


def _count_and_release(triples, cached) -> int:
    try:
        return triples.count()
    finally:
        for c in cached:
            c.unpersist()


def run_pipeline_throughput() -> dict:
    """One pipeline run on the synthetic scaling corpus at local[$CPUS]."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kargo_spark.session import get_spark
    from kargo_spark.synth import synth_documents

    spark = get_spark(app_name="kargo_scaling", master=f"local[{CPUS}]")
    # tiny warm-up so JVM/Arrow/Python-worker startup is excluded
    _count_and_release(*_lazy_triples(spark, synth_documents(spark, n_rows=50)))
    # distinct_paths: without it docs_clean's (repo,path,commit) dedup
    # collapses any corpus to ~10k real docs (synth path space cap) and the
    # "scaling" measurement degenerates to fixed work — round-3 finding
    docs = synth_documents(
        spark, n_rows=SCALING_DOCS, words_per_doc=SCALING_WORDS, distinct_paths=True
    )
    docs = docs.repartition(int(CPUS) * 4).persist()
    n_docs = docs.count()
    t0 = time.time()
    n_triples = _count_and_release(*_lazy_triples(spark, docs))
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
    elif "--jvm-calibration" in sys.argv:
        print(json.dumps(run_jvm_calibration()))
    elif "--scaling-multi" in sys.argv:
        print(json.dumps(run_scaling_multi()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
