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
              jaccard_threshold: float = 0.8) -> DataFrame:
    """(loser_id, keeper_id) for near-identical texts.

    MinHash band join → candidate pairs → exact Jaccard verify on
    word 3-shingles → keep the lowest id of each verified pair.
    """
    # ONE bound expression per row computes the distinct shingles and
    # every band's minhash (split/shingling evaluated once — see the
    # _SHINGLE_EXPR binding note in catalog.py); bands are EXPLODED to
    # rows so all n_bands buckets join in a single self-join on _band.
    # Both join sides share an identical plan → ReuseExchange computes
    # the scan + shingling once; no cache (r01 leaked one here).
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
    )
    a_side = sig.select(
        F.col("_id").alias("id_a"), F.col("_shd").alias("sh_a"),
        "_bandpos", "_band",
    )
    b_side = sig.select(
        F.col("_id").alias("id_b"), F.col("_shd").alias("sh_b"),
        "_bandpos", "_band",
    )
    pairs = (
        a_side.join(b_side, ["_bandpos", "_band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
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
