"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Heritage: the reference has no dedup surface; these are the LLM-pipeline
extensions (BASELINE.json north star). All candidate generation is
sub-quadratic and expressed as DataFrame ops so Catalyst/AQE handles the
physical plan:

  - exact:   one shuffle on the fingerprint hash (map-side partial agg).
  - minhash: per-row signature (JVM xxhash64 — no Python), explode to
    (band, band_hash) keys, self-join per bucket. At 100 TB the bucket join
    is the only shuffle; band hashes are uniformly distributed so AQE's skew
    split handles pathological buckets (e.g. boilerplate-heavy corpora).
  - simhash: 64-bit signature via per-token hashes; near-dup = small Hamming
    distance within 16-bit band blocks (pigeonhole: d<=3 over 4 blocks →
    at least one block equal).
  - ngram_jaccard: exact pairwise Jaccard, blocked to keep the pair count
    bounded; the verification primitive for the approximate methods.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.llm.text import tokens


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct token n-gram shingle set."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized-text hash: keep the minimum id per group.
    One shuffle; at 100 TB hash first so the shuffle key is 16 bytes, not the
    document."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.withColumn("fp", F.md5(normalized))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _seeded_hash(seed: int):
    # closure factory, NOT a default-arg lambda: pyspark inspects lambda arity
    # and a 2-arg lambda would receive the element index as its second arg.
    return lambda h: F.xxhash64(F.lit(seed), h)


def minhash_signature(shingle_hashes: Column, num_hashes: int = 32) -> Column:
    """MinHash signature over PRE-HASHED shingles (array<long>): per seed,
    element-wise min of xxhash64(seed, h). Re-seeding hashes longs, not
    strings — the string is hashed exactly once upstream."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_hashes, _seeded_hash(seed)))
            for seed in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs with exact Jaccard verification.

    shingle → signature → (band_id, band_hash) explode → bucket self-join →
    array_intersect/union verify. Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.

    Scale: the bucket join shuffles only (band_id, band_hash, id, shingles).
    For 100 TB, shingle arrays ride the shuffle once; extremely hot buckets
    (near-identical boilerplate) are split by AQE skew handling. bands=8 over
    32 hashes (r=4): P(candidate) = 1-(1-j^4)^8 — ~0.97 at j=0.8, <0.04 at
    j=0.3 — the standard S-curve for this threshold."""
    rows_per_band = num_hashes // bands
    shuffle_n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # Two-stage pipeline with a repartition fence between them:
    #   stage 1 tokenizes + shingles + hashes each shingle string ONCE;
    #   stage 2 derives all `num_hashes` minhashes from the long array.
    # Without the fence Catalyst's CollapseProject would inline the shingle
    # expression into every one of the 32 signature expressions (a 32×
    # recompute of the string work — measured 30s → 3s at sf0.1). The fence
    # also spreads signature work across the cluster when the source is a
    # single small file.
    hashed = (
        df.select(F.col(id_col).alias("id"), shingles(text_col).alias("sh"))
        .filter(F.size("sh") >= 1)
        .withColumn("shx", F.transform("sh", lambda s: F.xxhash64(s)))
        .repartition(shuffle_n, "id")
    )
    base = hashed.withColumn("sig", minhash_signature(F.col("shx"), num_hashes))
    # Shuffle hygiene: the bucket join carries ONLY (band_id, band_hash, id)
    # — 24 bytes/row — never the shingle arrays. Shingles are re-attached to
    # the (tiny) deduped candidate set afterwards. At 100 TB this is the
    # difference between shuffling ids and shuffling the corpus × bands.
    banded = base.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)])
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    cand_ids = (
        banded.select(F.col("id").alias("id_a"), "band_id", "band_hash")
        .join(
            banded.select(F.col("id").alias("id_b"), "band_id", "band_hash"),
            ["band_id", "band_hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_only = base.select("id", "sh")
    cand = cand_ids.join(
        sh_only.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh_only.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text_col: Column | str, token_hash_seed: int = 7) -> Column:
    """64-bit SimHash: sign of per-bit weighted sums of token hashes.

    Pure JVM expressions: per token xxhash64, then for each bit accumulate
    +1/-1 via aggregate over the token array. Cost is 64 aggregate passes —
    constant per row, map-side only."""
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t, F.lit(token_hash_seed)))

    def bit_merge(bit: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for bit in range(64):
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), bit_merge(bit))
        bit_cols.append(F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).alias(f"b{bit}"))
    # pack bits into one long
    packed = F.lit(0).cast("long")
    for bit, c in enumerate(bit_cols):
        packed = packed.bitwiseOR(F.shiftleft(c, bit))
    return packed


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit quarters (pigeonhole — any pair
    with Hamming distance <= 3 shares at least one of 4 exact quarter-blocks),
    verify Hamming via bit_count(xor). One shuffle on (block_id, block_val)."""
    base = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sh64"))
    blocked = base.select(
        "id",
        "sh64",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sh64", 16 * q).bitwiseAND(F.lit(0xFFFF))
                    for q in range(4)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    left = blocked.select(F.col("id").alias("id_a"), F.col("sh64").alias("ha"), "block_id", "block_val")
    right = blocked.select(F.col("id").alias("id_b"), F.col("sh64").alias("hb"), "block_id", "block_val")
    return (
        left.join(right, ["block_id", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard pairs within a blocking key (or a length bucket by
    default). Quadratic *within block only* — the exact-verification
    primitive; use minhash_lsh_pairs for unblocked corpora."""
    base = df.select(
        F.col(id_col).alias("id"),
        shingles(text_col, n).alias("sh"),
        (F.col(block_col) if block_col else (F.size(tokens(text_col)) / 16).cast("int")).alias(
            "blk"
        ),
    ).filter(F.size("sh") >= 1)
    a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "blk")
    b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "blk")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )
