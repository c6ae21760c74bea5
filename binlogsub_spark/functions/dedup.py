"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup — the dedup family a 100 TB training-data
pipeline needs, each designed around its shuffle profile.

Scale design notes:
* exact: one hash-groupBy on a 32-char fingerprint — map-side combine,
  no skew (md5 is uniform).
* n-gram Jaccard: the exact-verification path. Self-join on shingles with
  a document-frequency cap (stop-shingles dropped) so no shingle bucket
  explodes; at 100 TB the cap is what keeps the join's biggest key bounded.
* MinHash+LSH: the scale path — candidate generation cost is
  O(docs x bands), never O(docs^2); only candidates pay the exact-Jaccard
  verification join.
* SimHash: 64-bit signature via per-bit aggregation (JVM-side bit math),
  Hamming<=k candidates via 4-band exact-match blocking (pigeonhole).
* embedding cosine: see functions/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from binlogsub_spark.functions.text import fingerprint, normalize_text


# ------------------------------------------------------------------ exact
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per document: its fingerprint, the keeper (min id in its
    group), and whether it is a duplicate of the keeper."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    keepers = fp.groupBy("fp").agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("group_size")
    )
    return (
        fp.join(keepers, "fp")
        .withColumn("is_duplicate", F.col(id_col) != F.col("keeper_id"))
        .select(id_col, "fp", "keeper_id", "group_size", "is_duplicate")
    )


# ------------------------------------------------------------- shingling
def shingle_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle). JVM-side only
    (split + transform + explode)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (a<b) above threshold.

    |A∩B| from a self-join on shingles; |A|,|B| from per-doc counts;
    J = c / (|A|+|B|-c). Shingles appearing in more than ``max_doc_freq``
    docs are dropped (stop-shingles) — bounds the join's hottest key.
    """
    sh = shingle_df(df, text_col, id_col, n).persist()
    try:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .where(F.col("df_") <= max_doc_freq)
            .select("shingle")
        )
        sh2 = sh.join(rare, "shingle")
        a, b = sh2.alias("a"), sh2.alias("b")
        inter = (
            a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .agg(F.count("*").alias("inter"))
        )
        out = (
            inter.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
            .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
                ),
            )
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        return out
    finally:
        sh.unpersist(blocking=False)


# ---------------------------------------------------------- MinHash + LSH
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — num_hashes independent min-hashes of the
    shingle set, all via xxhash64(shingle, i) (JVM, no UDF)."""
    sh = shingle_df(df, text_col, id_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified with exact Jaccard.

    bands=16 x rows=4 over 64 hashes -> S-curve threshold ~ (1/16)^(1/4)
    ≈ 0.5. Candidates come from an equi-join on (band_idx, band_hash) —
    shuffle keyed on band buckets, never a cross join.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, n)
    band = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    a, b = band.alias("a"), band.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    # exact verification only on candidates
    sh = shingle_df(df, text_col, id_col, n).persist()
    try:
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
        inter = (
            cand.join(sh.withColumnsRenamed({id_col: "id_a", "shingle": "s"}), "id_a")
            .join(sh.withColumnsRenamed({id_col: "id_b", "shingle": "s"}), ["id_b", "s"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
        out = (
            inter.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
            .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
            .withColumn(
                "jaccard",
                F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
            )
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        return out
    finally:
        sh.unpersist(blocking=False)


# ----------------------------------------------------------------- SimHash
def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: bigint) — 64-bit SimHash over token hashes, computed
    with 64 conditional-sum aggregations (pure JVM bit arithmetic)."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(63)  # bit 63 is the sign bit; 63 bits suffice
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sig = F.lit(0).cast("long")
    for b in range(63):
        sig = sig + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 4-band
    blocking (pigeonhole: <=3 differing bits => at least one 16-bit band
    identical), then exact popcount verification."""
    sig = simhash(df, text_col, id_col)
    bands = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bh")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
