"""Skew handling: size-bucketed repartitioning + key salting helpers.

North-star: "Skew from giant documents and hub terms is handled via salted
repartitioning and size-bucketed Arrow batches".

* ``size_bucketed`` — repartition documents by (size bucket, salt) so the
  Arrow batches entering a pandas-UDF stage have balanced byte volume: a
  handful of 100×-median documents land in their own partitions instead of
  stalling one task that also holds thousands of small docs.
* ``salted_agg`` — generic two-phase aggregation for hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def size_bucketed(
    df: DataFrame,
    payload_col: str,
    n_partitions: int | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Repartition by (log2 size bucket, hash salt). Documents of similar
    size co-locate (uniform Arrow batch cost) while the salt spreads each
    bucket across the cluster.

    The salt is derived from the PAYLOAD column and defaults to 32x the
    partition count — both halves were the r05 8->32 scaling-tail root
    cause (guide §2.5: a synthetic partitioning key needs 20-100x more
    distinct values than partitions, or hash collisions leave some
    partitions holding several buckets and others empty). The old salt
    hashed the FIRST column — the repo id, ~20 distinct values on the
    scaling corpus — into 64 buckets, so the Python stages ran at <= 20
    effective partitions with up to 4x record skew no matter how many
    partitions were requested (measured: tokenize-stage tail ratio 3.5,
    max-task 22 s vs median 6.3 s, at 8 cores / 20k docs; at local[32]'s
    128 requested partitions most were simply empty). Hashing the payload
    gives ~one salt per document: same shuffle, uniform occupancy."""
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if salt_buckets is None:
        salt_buckets = 32 * n
    bucket = F.floor(F.log2(F.greatest(F.length(F.col(payload_col)), F.lit(1))))
    salt = F.pmod(F.abs(F.xxhash64(F.col(payload_col))), F.lit(salt_buckets))
    return (
        df.withColumn("__size_bucket", bucket)
        .withColumn("__salt", salt)
        .repartition(n, "__size_bucket", "__salt")
        .drop("__size_bucket", "__salt")
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list,
    salt_buckets: int = 16,
):
    """Two-phase (salted) aggregation for additive aggregates: groupBy
    (key, salt) partial -> groupBy key final. Use when one key dominates
    (hub terms). ``aggs`` are (col_name, 'sum'|'count') pairs."""
    salted = df.withColumn(
        "__salt", F.pmod(F.abs(F.xxhash64(*[F.col(c) for c in key_cols])), F.lit(salt_buckets))
    )
    partial_exprs = []
    final_exprs = []
    for name, kind in aggs:
        if kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{name}"))
        else:
            partial_exprs.append(F.sum(name).alias(f"__p_{name}"))
        final_exprs.append(F.sum(f"__p_{name}").alias(name))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)
