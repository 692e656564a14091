"""Corpus deduplication pipeline — the composed, usable API.

The catalog exposes each primitive (exact hash-group, MinHash
signatures, LSH banding, Jaccard verify) as oracle-checked queries;
this module composes them into the operator a training-data pipeline
actually calls: ``dedupe_corpus(df) → (keep_df, drop_df)``.

Plan shape at 100 TB: one shuffle to group exact dups (hash of
content), one equi-join on LSH band buckets for near-dup candidates
(never an O(n²) cross join), Jaccard verification only on candidates,
and a greedy keep-lowest-id resolution — all builtin expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import _SHINGLE_EXPR, _mh


def exact_dups(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(loser_id, keeper_id) pairs for byte-identical texts."""
    g = df.groupBy(F.md5(F.col(text_col)).alias("_fp")).agg(
        F.min(id_col).alias("keeper"),
        F.collect_list(id_col).alias("members"),
    )
    return (
        g.select("keeper", F.explode("members").alias("loser"))
        .filter(F.col("loser") != F.col("keeper"))
        .select("loser", "keeper")
    )


def near_dups(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", n_bands: int = 4,
              jaccard_threshold: float = 0.8,
              max_band_size: int = 10_000) -> DataFrame:
    """(loser_id, keeper_id) for near-identical texts.

    MinHash band join → candidate pairs → exact Jaccard verify on
    word 3-shingles → keep the lowest id of each verified pair.

    ``max_band_size`` drops pathological bands (boilerplate corpora
    surviving exact dedup) so one band cannot OOM an aggregation
    buffer: recall degrades instead of the job dying.
    """
    # ONE bound expression per row computes the distinct shingles and
    # every band's minhash (split/shingling evaluated once — see the
    # _SHINGLE_EXPR binding note in catalog.py); bands are EXPLODED to
    # rows and docs GROUPED per (band_index, band_value), so the whole
    # candidate generation is one scan + one shuffle — a band self-join
    # would scan and re-shingle the corpus twice (HOF lambdas defeat
    # exchange-reuse canonicalization; measured in catalog.py), and
    # r01's version additionally leaked a cache.  Work per group is
    # |band|²; run exact_dups first (dedupe_corpus does) so identical
    # texts collapse before they can form a mega-band.
    mh_arr = "array(" + ", ".join(_mh(b) for b in range(n_bands)) + ")"
    bound = (
        "element_at(transform(array(array_distinct("
        + _SHINGLE_EXPR.format(col=text_col)
        + ")), shd -> named_struct('shd', shd, 'bands', " + mh_arr
        + ")), 1)"
    )
    sig = df.select(
        F.col(id_col).alias("_id"), F.expr(bound).alias("_s")
    ).select(
        "_id", F.col("_s.shd").alias("_shd"),
        F.posexplode(F.col("_s.bands")).alias("_bandpos", "_band"),
    ).filter(F.col("_band").isNotNull())
    grouped = sig.groupBy("_bandpos", "_band").agg(
        F.collect_list(F.struct("_id", "_shd")).alias("_ds")
    ).filter((F.size("_ds") >= 2) & (F.size("_ds") <= max_band_size))
    pairs = (
        grouped.select(F.explode("_ds").alias("_a"), F.col("_ds"))
        .select("_a", F.explode("_ds").alias("_b"))
        .filter(F.col("_a._id") < F.col("_b._id"))
        .select(
            F.col("_a._id").alias("id_a"), F.col("_b._id").alias("id_b"),
            F.col("_a._shd").alias("sh_a"), F.col("_b._shd").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    verified = pairs.withColumn(
        "jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    ).filter(F.col("jaccard") >= jaccard_threshold)
    return verified.select(
        F.col("id_b").alias("loser"), F.col("id_a").alias("keeper"),
        "jaccard",
    )


def dedupe_corpus(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  jaccard_threshold: float = 0.8) -> tuple[DataFrame, DataFrame]:
    """Return (kept, dropped): dropped = exact dups ∪ verified
    near-dups; kept = everything else."""
    ex = exact_dups(df, id_col, text_col).select("loser")
    nd = near_dups(df, id_col, text_col,
                   jaccard_threshold=jaccard_threshold).select("loser")
    losers = ex.unionByName(nd).distinct()
    dropped = df.join(
        losers.withColumnRenamed("loser", id_col), id_col, "left_semi"
    )
    kept = df.join(
        losers.withColumnRenamed("loser", id_col), id_col, "left_anti"
    )
    return kept, dropped
