"""Deduplication family for large-scale training-data pipelines.

Five dedup strategies over a document table ``(doc_id, text)``:

* ``exact_dedup``          — hash-groupBy on sha2(text); pure SQL.
* ``minhash_lsh_dedup``    — shingle -> minhash signature -> band buckets
                             -> bucket join -> Jaccard verify. The classic
                             MinHash+LSH near-dup (Broder; used by every
                             web-scale corpus pipeline).
* ``simhash_dedup``        — 64-bit SimHash (Charikar) with Hamming verify,
                             blocked on >=16-bit block-combination keys
                             (``simhash_band_spec``).
* ``ngram_jaccard_dedup``  — exact n-gram Jaccard on candidate pairs
                             (blocked by a cheap key to avoid O(n²)).
* ``embedding_neardup``    — cosine >= threshold over an embedding column.

All hashing is seeded/deterministic (xxhash64 JVM-side where possible, md5
in pandas UDFs) — never Python ``hash``. Signatures are computed
JVM-side with ``F.transform`` over shingle arrays, so the only shuffle is
the band-bucket groupBy/join; at 100 TB that join is the cost and it is
band-parallel and key-balanced by construction (bucket key = (band, hash)).
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .embedding import cosine_expr


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != "")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical text; dedup key =
    sha2-256 so the groupBy never carries full payloads wider than needed."""
    return (
        docs.withColumn("__h", F.sha2(F.col(text_col), 256))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__h")
    )


def shingles(col, n: int = 3):
    """Word n-gram shingle array (distinct), JVM-side."""
    toks = _tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
        )
    )


def hashed_shingles(tok_col, n: int = 3):
    """Distinct word n-gram shingles as 64-bit hashes, built WITHOUT ever
    materializing the shingle strings: xxhash64 over the n consecutive
    tokens directly. Set-equality semantics match ``shingles`` modulo
    64-bit collisions (~2^-64 per cross-doc shingle pair — the same
    tolerance the Jaccard verify step already accepts), but skipping the
    per-shingle slice+join string construction is ~10x cheaper (measured
    4.8 s -> 0.5 s over the sf0.1 corpus, the dominant cost of the
    minhash query): at 100 TB the shingle pass is the whole bill.

    ``tok_col`` MUST be an already-projected token-array column (a
    previous select's attribute, e.g. ``_tokens(text).alias("_t")``), NOT
    an inline expression: higher-order-function lambdas are interpreted
    with no common-subexpression elimination, so an inline tokenizer
    would re-split the whole document once per element_at — measured
    O(tokens^2), 2x SLOWER than the string path it replaces. The <n-token
    special case hashes the full token array, mirroring ``shingles``'
    single whole-text shingle."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(tok_col) - n, F.lit(0)))
    return F.when(F.size(tok_col) < n, F.array(F.xxhash64(tok_col))).otherwise(
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.element_at(tok_col, i + j + 1) for j in range(n)]
                ),
            )
        )
    )


def minhash_signature(shingle_col, num_hashes: int = 32, seed: int = 42):
    """num_hashes minhash values: min over shingles of xxhash64(shingle, k).

    Single-pass: ONE aggregate over the shingle array with a num_hashes-wide
    accumulator (zip_with least) — the naive form (num_hashes separate
    array_min/transform pairs) re-traverses the array num_hashes times and
    bloats codegen (r01 plan-audit note)."""
    seeds = F.array(*[F.lit(seed + k) for k in range(num_hashes)])
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes)
    return F.aggregate(
        shingle_col,
        init,
        lambda acc, s: F.zip_with(acc, seeds, lambda a, k: F.least(a, F.xxhash64(s, k))),
    )


def derive_bands(num_hashes: int, jaccard_threshold: float) -> int:
    """Pick the band count whose S-curve midpoint (1/b)^(1/r) sits safely
    BELOW the caller's threshold (<= 0.75*tau), so true pairs at tau are
    candidates with near-certainty and the exact-Jaccard verify step does
    the precision work. r01 defect: a fixed b=8,r=4 (midpoint ~0.59) was
    used for tau=0.2, silently missing most 0.2-0.5 pairs (ADVICE med #2).

    Chooses the largest rows-per-band r (fewest candidates) meeting the
    recall margin; falls back to r=1 (b=num_hashes, recall
    1-(1-tau)^num_hashes — e.g. 99.92% at tau=0.2 with 32 hashes).
    """
    for r in sorted((r for r in range(1, num_hashes + 1) if num_hashes % r == 0), reverse=True):
        b = num_hashes // r
        if (1.0 / b) ** (1.0 / r) <= 0.75 * jaccard_threshold:
            return b
    return num_hashes


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int | None = None,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    capped_stats: dict | None = None,
    broadcast_verify: bool | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding + exact Jaccard verify.

    rows_per_band = num_hashes/bands; a pair collides if any band's hash
    slice matches. Verification recomputes true shingle Jaccard on the
    collided pairs only (the whole point of LSH: verify set is tiny).
    ``bands=None`` derives the banding from ``jaccard_threshold`` (see
    ``derive_bands``) so recall tracks the caller's tau.
    Returns (a, b, jaccard) with a < b.

    ``max_bucket_size`` is the hot-bucket guard (r02 verdict weak-spot #2):
    with r=1 banding the bucket key is a single raw minhash value, so a
    globally-minimal stop-shingle hash lands MANY docs in one bucket and
    the band self-join goes quadratic in that bucket at corpus scale.
    Buckets larger than the cap are dropped from the candidate join
    (mirroring the df>1000 guard in ``ngram_jaccard_pairs``). A pair that
    ONLY collides in capped buckets is missed — but at b bands each true
    pair has b independent collision chances, so the residual miss
    probability stays near the banding S-curve; the cap only binds on
    buckets that were never informative (shared stop-shingle, not shared
    content). Set ``None`` to disable (exact parity / tiny corpora).

    Per the repo's no-silent-caps convention (r03 ADVICE low #1): pass a
    dict as ``capped_stats`` and it is filled with
    ``{"dropped_buckets": int, "dropped_rows": int}`` — how often and how
    hard the cap actually bound on this corpus. Costs one eager extra job
    over the banding lineage (signatures come from the persisted ``base``
    cache; the hot-bucket table itself is persisted so the anti-join
    reuses it); the default path stays fully lazy.

    ``broadcast_verify``: the verify step attaches both shingle-hash
    arrays to each candidate pair — two joins that, as sort-merge, each
    shuffle the pair table WITH array payloads. When the shingle table is
    small enough to broadcast, both joins go map-side (measured ~2.5x
    faster verify at sf0.1). OPT-IN (``True``): the caller asserts the
    corpus is small (≲50k docs / ~20 MB of shingle arrays). The default
    (``False``/``None``) is sort-merge and stays fully lazy — an earlier
    auto mode counted ``docs`` eagerly at DataFrame-construction time,
    which for filtered/derived inputs is a full scan job before any dedup
    work (r04 ADVICE low #1); the 10^12-row path must never pay that.
    """
    if bands is None:
        bands = derive_bands(num_hashes, jaccard_threshold)
    r = num_hashes // bands
    # shingles enter as 64-bit hashes (hashed_shingles): the string form
    # was the dominant cost of the whole query (~10x slower to build) and
    # nothing downstream needs it — banding hashes the signature values
    # and the verify Jaccard was already computed over hashed shingles.
    base = (
        docs.select(F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("_t"))
        .select("id", hashed_shingles(F.col("_t"), shingle_n).alias("sh"))
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes, seed))
        .persist()
    )
    # band table carries ONLY (id, band, bucket): the shingle array must not
    # be duplicated across bands nor shuffled through the candidate join
    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.element_at("sig", b * r + j + 1) for j in range(r)])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        hot_buckets = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket_size)
        )
        if capped_stats is not None:
            # one eager job over the (tiny — hot buckets are by definition
            # few) table, then rebuild it as a literal DataFrame for the
            # anti-join: no lingering persist to leak cached blocks for the
            # session lifetime (r04 ADVICE low #2), and the anti-join side
            # broadcasts for free. The banding lineage the job reads
            # re-derives from the persisted `base` signatures, not raw text.
            rows = hot_buckets.collect()
            capped_stats["dropped_buckets"] = len(rows)
            capped_stats["dropped_rows"] = int(sum(r["n"] for r in rows))
            if rows:
                hot_lit = docs.sparkSession.createDataFrame(
                    [(r["band"], r["bucket"]) for r in rows], "band int, bucket long"
                )
                banded = banded.join(F.broadcast(hot_lit), ["band", "bucket"], "left_anti")
        else:
            banded = banded.join(
                hot_buckets.select("band", "bucket"), ["band", "bucket"], "left_anti"
            )
    elif capped_stats is not None:
        capped_stats["dropped_buckets"] = 0
        capped_stats["dropped_rows"] = 0
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    # verify payload: the shingle-hash arrays as-is — 64-bit longs, so the
    # candidate join shuffles compact arrays, and set Jaccard over them
    # equals string-set Jaccard absent 64-bit collisions within a pair
    # (~1e-14 for 10^3-shingle docs).
    sh_tab = base.select("id", F.col("sh").alias("shh"))
    sha_side = sh_tab.withColumnRenamed("id", "a").withColumnRenamed("shh", "sha")
    shb_side = sh_tab.withColumnRenamed("id", "b").withColumnRenamed("shh", "shb")
    if broadcast_verify:
        sha_side, shb_side = F.broadcast(sha_side), F.broadcast(shb_side)
        # the exact-Jaccard verify is CPU-dense but byte-light (the pair
        # table is two longs per row), so AQE's byte-based coalescing
        # folds it onto 1-2 tasks (profiled r06: 3.4 s of array
        # intersections on 2 tasks while 30 cores idle). Re-spread the
        # deduped candidate set to the session's parallelism before the
        # map-side verify; only on the opt-in small-corpus path — the
        # lazy sort-merge path at real scale gets wide partitions from
        # its data volume naturally.
        cand = cand.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        )
    joined = cand.join(sha_side, "a").join(shb_side, "b")
    jac = F.size(F.array_intersect("sha", "shb")) / F.size(F.array_union("sha", "shb"))
    return (
        joined.withColumn("jaccard", jac.cast("double"))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", "jaccard")
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
    capped_stats: dict | None = None,
    **kw,
) -> DataFrame:
    """Documents surviving near-dup removal: drop the larger id of each
    verified pair (transitively safe for dedup purposes: every removed doc
    has a kept near-duplicate). The hot-bucket cap and its observability
    hook plumb through explicitly (r03 ADVICE low #1) — see
    ``minhash_lsh_pairs``."""
    pairs = minhash_lsh_pairs(
        docs, text_col, id_col,
        max_bucket_size=max_bucket_size, capped_stats=capped_stats, **kw,
    )
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def md5_token_hash60(t):
    """60-bit token hash from md5 (15 hex chars) — SQL-reproducible
    (DuckDB: CAST('0x' || substring(md5(w), 1, 15) AS BIGINT)), unlike
    xxhash64. SimHash built on it leaves bits 60-63 at zero (every vote
    is -1 there), which only narrows the informative bit range; banding
    and verify are unchanged. Used by the oracle-checked driver query so
    the banded join's full-recall guarantee is certified against an exact
    all-pairs Hamming oracle."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash64(col, seed: int = 42, token_hash=None):
    """64-bit SimHash JVM-side: per token hash -> ±1 per bit -> sign of sum.

    Single-pass formulation: ONE aggregate over the token-hash array with a
    64-wide int accumulator (zip_with add of each hash's bit signs), then
    one fold packs the sign vector into the long. The naive form (64
    separate aggregates, one per bit) re-traverses the token array 64x and
    blows up codegen — this version is O(tokens) per row.

    ``token_hash``: Column function token -> long; default seeded
    xxhash64 (fastest), ``md5_token_hash60`` for SQL-reproducibility.
    """
    toks = _tokens(col)
    if token_hash is None:
        th = F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))
    else:
        th = F.transform(toks, token_hash)
    idx = F.sequence(F.lit(0), F.lit(63))
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    # DataFrame-API shiftright/shiftleft require literal shift counts; the
    # SQL functions accept columns — call them by name for the lambda vars.
    sr = lambda x, i: F.call_function("shiftright", x, i.cast("int"))  # noqa: E731
    sl = lambda x, i: F.call_function("shiftleft", x, i.cast("int"))  # noqa: E731
    sums = F.aggregate(
        th,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            idx,
            lambda a, i: a + F.when(sr(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            sums, idx,
            lambda s, i: F.when(s > 0, sl(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b),
    )
    return packed


def simhash_band_spec(
    max_hamming: int, min_key_bits: int = 16, max_tables: int = 2048
) -> tuple[list[tuple[int, int]], list[tuple[int, ...]]]:
    """Block-combination banding spec for a Hamming-radius join whose join
    keys are guaranteed ``>= min_key_bits`` wide (r02 verdict weak-spot #1:
    the h+1-contiguous-band scheme degenerates to 64/(h+1)-bit keys — 7
    bits at h=8 — so every band join is Θ(n²/2^7) at corpus scale).

    Scheme: split the 64 bits into ``b = max_hamming + m`` blocks and key
    one table on every m-block combination. A pair within Hamming distance
    h dirties at most h blocks, leaving >= m clean blocks, and the table
    keyed on exactly those m clean blocks matches — FULL recall by
    pigeonhole, same as before, but the key now concatenates m blocks:
    ``m`` is the smallest count whose worst-case key width
    ``m * floor(64/b)`` reaches ``min_key_bits``. h <= 3 keeps m=1 (the
    old contiguous scheme, already >= 16-bit keys); h=8 gives b=12, m=4 —
    C(12,4)=495 tables of >= 20-bit keys.

    Returns ``(blocks, tables)``: blocks as (start_bit, width), tables as
    block-index tuples. Raises for radii whose table count would exceed
    ``max_tables`` (the documented radius contract: h <= 12 at the
    defaults — beyond that Hamming LSH stops being meaningful on 64 bits).
    """
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    for m in range(1, 65):
        b = max_hamming + m
        if b > 64:
            break
        if m * (64 // b) >= min_key_bits:
            n_tables = math.comb(b, m)
            if n_tables > max_tables:
                raise ValueError(
                    f"max_hamming={max_hamming} needs {n_tables} band tables "
                    f"(> max_tables={max_tables}); the radius contract for "
                    f"64-bit SimHash banding at min_key_bits={min_key_bits} "
                    "tops out around h=12"
                )
            bounds = [64 * i // b for i in range(b + 1)]
            blocks = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(b)]
            return blocks, [tuple(c) for c in combinations(range(b), m)]
    raise ValueError(
        f"no banding with keys >= {min_key_bits} bits exists for "
        f"max_hamming={max_hamming} on 64-bit hashes"
    )


def simhash_pairs_from_hashes(
    hashed: DataFrame,
    max_hamming: int = 3,
    id_col: str = "id",
    sim_col: str = "sim",
    min_key_bits: int = 16,
    max_bucket_size: int | None = None,
    capped_stats: dict | None = None,
) -> DataFrame:
    """Banded Hamming join over precomputed 64-bit SimHash values.

    Banding = the block-combination scheme of ``simhash_band_spec``: FULL
    recall up to ``max_hamming`` by pigeonhole, with every join key at
    least ``min_key_bits`` wide so no band bucket can degenerate into an
    n²-sized join at corpus scale (r02 verdict weak-spot #1; the old
    h+1-contiguous-band layout had 7-bit keys at h=8). Verify = exact
    bit_count(xor).

    Plan shape (re-profiled r06): the b block values are computed once
    into an array column, the table->block-combination map is a tiny
    broadcast DataFrame (DATA, not a 495-element literal expression — the
    literal variant cost ~50 s of pure planning/codegen), and each table
    key is xxhash64 over (table id, its block values), so different
    tables never share buckets. The (id, sim) base is PERSISTED so the
    expensive SimHash aggregate upstream is computed once, not once per
    self-join side. The self-join is a single equi-join on ``key`` whose
    shuffle carries ONLY (id, key) — at 495 tables/doc the banded table
    is ~500x the corpus row count, so every byte on it is multiplied;
    ``sim`` re-attaches to the (tiny, post-dedup) candidate pair set via
    two joins against the n-row base instead of riding the banded
    exchange and the pair dedup (guide §2.3 'shuffle keys and metadata
    instead of payloads').

    ``max_bucket_size`` is the DENSITY GUARD (r05 verdict next-step #4:
    simhash at radius 8 on a dense corpus is output-quadratic — measured
    66x pairs for 10x docs at sf1.0 — and had no observability before
    the join materializes millions of pairs). Band buckets holding more
    than ``max_bucket_size`` docs are dropped from the candidate join,
    bounding any single bucket's contribution to max_bucket_size² pairs.
    Unlike minhash's b-independent-chances banding, simhash banding is a
    pigeonhole FULL-RECALL construction — a capped bucket genuinely can
    lose pairs whose only clean block combination was the hot one — so
    the default is None (off, exact contract intact) and engaging the
    cap is an explicit recall trade for dense corpora. Per the repo's
    no-silent-caps convention, pass ``capped_stats`` (dict) to receive
    {"dropped_buckets", "dropped_rows", "max_possible_pairs_dropped"} —
    a pre-join density probe costing one aggregate over the banded
    table (reads the persisted ``sh`` base, not raw text).
    """
    blocks, tables = simhash_band_spec(max_hamming, min_key_bits)

    def _block_val(start: int, width: int):
        key = F.shiftright("sim", start)
        if width < 64:
            # width 64 (max_hamming=0, one table) needs no mask — and
            # (1 << 64) - 1 would overflow a LongType literal anyway
            key = key.bitwiseAND(F.lit((1 << width) - 1))
        return key

    spark = hashed.sparkSession
    combo_df = spark.createDataFrame(
        [(t, list(tbl)) for t, tbl in enumerate(tables)], "tbl int, blks array<int>"
    )
    # persist: one SimHash pass for the corpus (both self-join sides and
    # the verify re-attach read this n-row, 16-byte/row cache). Same
    # lifetime convention as minhash_lsh_pairs' signature base.
    sh = hashed.select(F.col(id_col).alias("id"), F.col(sim_col).alias("sim")).persist()
    banded = (
        sh.withColumn("blk", F.array(*[_block_val(s, w) for s, w in blocks]))
        .join(F.broadcast(combo_df))
        .select(
            "id",
            # hash the block-value ARRAY directly (xxhash64 supports array
            # args): building a ","-joined string per (doc x table) row was
            # pure allocation overhead at 495 tables/doc
            F.xxhash64(
                "tbl",
                F.transform("blks", lambda i: F.element_at("blk", i + 1)),
            ).alias("key"),
        )
    )
    if max_bucket_size is not None:
        hot = (
            banded.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket_size)
        )
        if capped_stats is not None:
            rows = hot.collect()
            capped_stats["dropped_buckets"] = len(rows)
            capped_stats["dropped_rows"] = int(sum(r["n"] for r in rows))
            capped_stats["max_possible_pairs_dropped"] = int(
                sum(r["n"] * (r["n"] - 1) // 2 for r in rows)
            )
            if rows:
                hot_lit = hashed.sparkSession.createDataFrame(
                    [(r["key"],) for r in rows], "key long"
                )
                banded = banded.join(F.broadcast(hot_lit), ["key"], "left_anti")
        else:
            banded = banded.join(hot.select("key"), ["key"], "left_anti")
    elif capped_stats is not None:
        capped_stats["dropped_buckets"] = 0
        capped_stats["dropped_rows"] = 0
        capped_stats["max_possible_pairs_dropped"] = 0
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    sim_a = sh.select(F.col("id").alias("a"), F.col("sim").alias("sima"))
    sim_b = sh.select(F.col("id").alias("b"), F.col("sim").alias("simb"))
    return (
        cand.join(sim_a, "a")
        .join(sim_b, "b")
        .select(
            "a", "b",
            F.bit_count(F.col("sima").bitwiseXOR(F.col("simb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
    token_hash=None,
    max_bucket_size: int | None = None,
    capped_stats: dict | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band-blocked Hamming join with full
    recall up to ``max_hamming`` at the defaults; ``max_bucket_size`` /
    ``capped_stats`` engage the observable density guard (see
    ``simhash_pairs_from_hashes``)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        simhash64(F.col(text_col), seed, token_hash=token_hash).alias("sim"),
    )
    return simhash_pairs_from_hashes(
        sh, max_hamming=max_hamming,
        max_bucket_size=max_bucket_size, capped_stats=capped_stats,
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by shared shingle.

    Inverted-index join (explode shingles -> self-join on shingle) with a
    df-cutoff on hot shingles so a stop-shingle can't go quadratic; exact
    intersection/union via groupBy counts — no full text comparison. The
    index key is the 64-bit shingle hash (hashed_shingles): identical
    counts modulo ~2^-64 collisions, no shingle strings built or
    shuffled.
    """
    sh = docs.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("_t")
    ).select("id", F.explode(hashed_shingles(F.col("_t"), n)).alias("s"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # drop shingles present in too many docs (hub-shingle skew guard)
    hot = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > 1000)
    sh = sh.join(hot, "s", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "ia").withColumnRenamed("sz", "sza"), "ia")
        .join(sizes.withColumnRenamed("id", "ib").withColumnRenamed("sz", "szb"), "ib")
        .withColumn(
            "jaccard",
            (F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("ia").alias("a"), F.col("ib").alias("b"), "jaccard")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-blocked (random hyperplanes), cosine
    verified. Returns (a, b, cos) with a < b."""
    from .clustering import _lsh_buckets

    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    tables = None
    for t in range(2):
        bt = _lsh_buckets(v, "v", n_planes, seed + 17 * t, dim).withColumn("table", F.lit(t))
        tables = bt if tables is None else tables.unionByName(bt)
    a, b = tables.alias("a"), tables.alias("b")
    return (
        a.join(b, ["table", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"), F.col("b.id").alias("b"),
            cosine_expr(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .dropDuplicates(["a", "b"])
    )


def neardup_keep(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Consolidate near-dup pairs into keep/drop decisions: connected
    components over the (a, b) pair graph (label propagation, no driver
    loop over rows), keep the min-id representative per component.

    Returns (doc_id, keep boolean, rep = representative doc_id). Docs in
    no pair keep themselves. This is the step after any of the pair
    producers (minhash / simhash / ngram-jaccard / embedding): pairs →
    clusters → one survivor each, the standard corpus-dedup shape.
    """
    from .clustering import connected_components

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(edges)  # (vec_id, component)
    rep = comp.groupBy("component").agg(F.min("vec_id").alias("rep"))
    decided = comp.join(rep, "component").select(
        F.col("vec_id").alias(id_col), "rep"
    )
    return (
        docs.select(id_col)
        .join(decided, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("rep"), F.col(id_col)).alias("rep"),
            (F.coalesce(F.col("rep"), F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    hashed: bool = False,
) -> DataFrame:
    """Training-set decontamination: flag corpus documents that share any
    word ``n``-gram with a benchmark / eval corpus — the n-gram-overlap
    rule big-LM training pipelines apply before training (drop or mark
    docs that leak eval data).

    Scale shape: inverted-index join on the shingle string. The benchmark
    side (eval sets — thousands of rows, not TBs) is deduped to distinct
    (shingle, bench_id) and **broadcast**; the 100-TB corpus side streams
    through as an explode → broadcast-hash-join → partial-agg groupBy, so
    there is no shuffle of corpus shingles and no cross join.

    Returns (doc_id, n_hits = #distinct overlapping shingles,
    n_bench = #distinct benchmark docs hit).

    ``hashed=True`` joins on ``xxhash64(shingle)`` instead of the shingle
    string — 8-byte probe keys instead of ~50-byte strings, the right
    trade at 100-TB corpus scale (a 2^-64 collision merely over-flags a
    doc). Keep ``hashed=False`` where bit-exact SQL parity matters.
    """

    def _sh(df, out_id, in_id, in_text):
        if hashed:
            # hashed keys are built straight from the token array — the
            # shingle strings are never materialized (same 10x win as
            # minhash's hashed_shingles; the corpus side is the whole
            # cost of this operator)
            return df.select(
                F.col(in_id).alias(out_id), _tokens(F.col(in_text)).alias("_t")
            ).select(out_id, F.explode(hashed_shingles(F.col("_t"), n)).alias("s"))
        return df.select(
            F.col(in_id).alias(out_id),
            F.explode(shingles(F.col(in_text), n)).alias("s"),
        )

    d = _sh(docs, "doc_id", id_col, text_col)
    b = _sh(benchmark, "bench_id", bench_id_col, bench_text_col).dropDuplicates(
        ["bench_id", "s"]
    )
    return (
        d.join(F.broadcast(b), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_hits"),
            F.countDistinct("bench_id").alias("n_bench"),
        )
    )


def embedding_pairs_exact(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold — the correctness baseline /
    parity oracle for ``embedding_neardup_pairs`` (which is the LSH-blocked
    scale path). O(n²) by construction: use only for small corpora, recall
    audits, and oracle checks; never the pipeline default."""
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    a = v.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", cosine_expr(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
