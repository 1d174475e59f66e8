"""Substrate economics micro-bench: incremental merge vs full rebuild.

Builds a bucketed graph store of N synthetic triples, then measures
folding a B-triple batch in via graph_store.merge_into_graph_store
(store side scans bucketed in place; only the batch shuffles) against
recomputing the store from scratch from the unioned triple set (the
no-substrate alternative: full shuffle + full re-derivation). Prints one
JSON line per store size.

The merge still REWRITES the merged generation (copy-on-write — any
batch touches all hash buckets), so both paths share the write cost;
the substrate's win is the avoided shuffle of the store side and the
avoided recompute of the input chain. Run on a quiet host:
    python tools/bench_substrate.py [sizes_csv] [batch_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def synth_triples(spark, n: int, seed: int = 0):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("e"), (F.abs(F.xxhash64("id", F.lit(seed))) % (n // 4 + 1)).cast("string")).alias("subj"),
            F.concat(F.lit("rel_"), (F.col("id") % 7).cast("string")).alias("pred"),
            F.concat(F.lit("e"), (F.abs(F.xxhash64("id", F.lit(seed + 1))) % (n // 4 + 1)).cast("string")).alias("obj"),
            F.lit(1).cast("long").alias("support"),
        )
        .groupBy("subj", "pred", "obj")
        .agg(F.sum("support").alias("support"))
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kargo_spark.graph_store import merge_into_graph_store
    from kargo_spark.session import get_spark
    from kargo_spark.storage import write_graph_bucketed

    sizes = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1000000,4000000,16000000").split(",")]
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="bench_substrate")
    prefix = "bsub_store"
    for n in sizes:
        base = synth_triples(spark, n).persist()
        base.count()
        write_graph_bucketed(spark, base, prefix=prefix)  # store to merge into
        batch = synth_triples(spark, batch_rows, seed=99).persist()
        batch.count()

        t0 = time.time()
        merge_into_graph_store(spark, batch, prefix=prefix)
        t_merge = time.time() - t0

        t0 = time.time()
        rebuilt = (
            base.unionByName(batch)
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("support").alias("support"))
        )
        write_graph_bucketed(spark, rebuilt, prefix=f"{prefix}_rb")
        t_rebuild = time.time() - t0

        print(json.dumps({
            "store_rows": n, "batch_rows": batch_rows,
            "merge_sec": round(t_merge, 2), "rebuild_sec": round(t_rebuild, 2),
            "merge_speedup": round(t_rebuild / t_merge, 2),
        }))
        base.unpersist(); batch.unpersist()
        for p in (prefix, f"{prefix}_rb", f"{prefix}__stage"):
            for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
                spark.sql(f"DROP TABLE IF EXISTS {p}{suf}")


if __name__ == "__main__":
    main()
