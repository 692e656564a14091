"""Driver-contract operator catalog: Spark queries + DuckDB oracles.

One entry per operator family from SURVEY.md §2 (the reference's own
data operations plus the query surface it delegates to AQL/SQL —
``/root/reference/src/adapters/openehr/vendor/ehrbase.rs:253-382``,
``migrations/001_initial_schema.sql:149-176``), plus the
training-data-pipeline operators (dedup / similarity / text analysis)
that a 100 TB lake of source documents needs.

Every Spark query aliases its computed columns to the exact names the
oracle SQL uses (driver hash-compare contract).  All expressions are
built-in pyspark.sql.functions — JVM-side, whole-stage codegen; no
Python UDFs anywhere in this catalog.

Demos run on the driver-provided tables (TESTDATA.md):
``events``   (event_id, ts, user_id, event_type, value, props-json)
— stands in for the changelog;
``documents`` (doc_id, text, lang, source, n_chars) — stands in for
``(repo, path, content, lang)`` content rows;
``embeddings`` (vec_id, embedding float[64], label).
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Round 8 (guide §2.4/§6): the demo tables are single-file parquet with
# ONE row group, which Spark cannot split — every scan is one task and
# compute-heavy projections (shingling, md5 families, JSON parse,
# regex bundles) run single-threaded on a 32-core box regardless of
# maxPartitionBytes / minPartitionNum.  ``_tp`` hash-repartitions
# SMALL inputs across the default parallelism on the table's unique id
# before the heavy projection:
# * hash (not round-robin): round-robin pays a per-task local sort of
#   the whole input first (``spark.sql.execution.sortBeforeRepartition``,
#   needed for retry determinism) — measured +1 s on a 1M-row table;
#   hashing a unique id is retry-deterministic for free and spreads
#   perfectly (guide §2.5: key cardinality ≫ partitions);
# * only below the cap: a real 100 TB corpus is multi-file /
#   multi-row-group (the scan parallelizes itself) and a blind
#   repartition there would shuffle the lake.
# Only queries whose per-row compute dominates the exchange use _tp —
# cheap projections and map-side aggregates measured FASTER without it
# (the A/B table lives in OPTIMIZATION_r08.md).  Measured wins at the
# 1M-row scale shape: q_minhash_signature 6.8→0.6 s, q_ngram_jaccard
# 9.8→4.1 s, q_json_extract 2.4→1.0 s, q_topn_per_group 1.4→0.6 s.
_SPREAD_CAP = int(os.environ.get("ATLAS_SPREAD_MAX_BYTES", str(1 << 30)))

_TABLE_ID = {"documents": "doc_id", "events": "event_id",
             "embeddings": "vec_id"}


def _input_bytes(path: str) -> int:
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path) for f in fs
        )
    except OSError:
        return _SPREAD_CAP + 1  # unknown size: treat as big, no-op


def _tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if _input_bytes(path) <= _SPREAD_CAP:
        df = df.repartition(
            spark.sparkContext.defaultParallelism,
            F.col(_TABLE_ID[name]),
        )
    return df


def _cdf_changelog(ev: DataFrame, salt_content: bool = False) -> DataFrame:
    """The one event→changelog projection the CDF-family queries
    (q_cdf_emit / q_cdf_backfill / q_cdf_incremental_agg /
    q_feed_replica) share — keep it in lockstep with their DuckDB
    oracles' `cl` CTE.  ``salt_content`` appends the event id so no
    two events of a key are byte-identical (q_feed_replica needs the
    classifier's identical-bytes-is-no-change rule out of play)."""
    content = (
        F.concat(F.col("props"), F.lit("#"),
                 F.col("event_id").cast("string"))
        if salt_content else F.col("props")
    )
    return ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.concat(F.lit("r"), F.pmod(F.col("user_id"), F.lit(8))
                 .cast("string")).alias("repo"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("path"),
        F.concat(F.lit("c"), F.col("event_id").cast("string"))
        .alias("commit"),
        F.col("event_type").alias("lang"),
        content.alias("content"),
    )


def _events(spark: SparkSession, sf_dir: str,
            spread: bool = False) -> DataFrame:
    """events with ts normalized to TIMESTAMP (files carry NTZ;
    session TZ is UTC so the cast is wall-clock-identity).
    ``spread=True`` routes through ``_tp`` for compute-heavy consumers."""
    ev = (_tp if spread else _t)(spark, sf_dir, "events")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


# --------------------------------------------------------------------------
# CDC core (SURVEY §2.6: the delegated query surface we own natively)
# --------------------------------------------------------------------------

def q_lww_latest(spark, sf_dir):
    """W5/§2.6 dedup-by-id fold — the heart of the LWW merge.

    Round 8 (guide §2.3 "aggregate before you shuffle"): the r07
    ``row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
    event_id DESC) = 1`` window shipped EVERY event through one hash
    exchange and sorted it, just to keep one row per key.  A
    ``max(struct(ts, event_id, …))`` aggregate picks the identical
    winner (struct ordering is field-lexicographic — ts first, then
    the unique event_id, so the tiebreak matches the window's
    ORDER BY exactly) but partial-aggregates map-side: the exchange
    carries ≤|keys| rows per map task instead of the table.  Plan
    diff: the Window is gone; the fold compiles to a partial/final
    SortAggregate pair (a struct buffer is not hash-aggregable) whose
    sort key is just user_id, not (user_id, ts, event_id)
    (1.24 s → 0.6-0.7 s at the 1M-row scale shape, value-identical)."""
    ev = _events(spark, sf_dir)
    w = F.max(F.struct(
        F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value")
    )).alias("_w")
    return (
        ev.groupBy("user_id").agg(w)
        .select(
            "user_id",
            F.col("_w.event_id").alias("last_event_id"),
            F.col("_w.event_type").alias("last_type"),
            F.col("_w.value").alias("last_value"),
            F.unix_micros("_w.ts").alias("last_ts_us"),
        )
    )


def q_incremental_scan(spark, sf_dir):
    """S2 incremental change-index scan: rows newer than the watermark
    (predicate pushed to the parquet scan)."""
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("ts") > F.lit("2024-01-03 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", "event_type",
                F.unix_micros("ts").alias("ts_us"))
    )


def q_watermark_agg(spark, sf_dir):
    """Per-key watermark computation: groupBy(key).agg(max(ts), count)
    — true max, not positional-last (SURVEY §2.6 per-key max)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("max_ts_us"),
        F.count("*").alias("n_events"),
    )


def q_dedup_pairs(spark, sf_dir):
    """W5 duplicate-skip: distinct key projection."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


def q_antijoin_verify(spark, sf_dir):
    """O7 verification anti-join: expected keys absent from the sink
    (customers with no orders as the stand-in)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_point_lookup(spark, sf_dir):
    """S7 point-read by key (clustered-key filter)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") == 7).select(
        "event_id", "event_type", "value"
    )


def q_json_extract(spark, sf_dir):
    """§2.6 JSON path extraction (payload decode analog of S3/T6)."""
    # _tp: the JSON parse is the per-row cost — spread it across cores
    # before the aggregate (guide §4: the single-row-group scan would
    # otherwise parse every props string in one task)
    ev = _tp(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_val", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("k_val")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
    )


def q_orderby_topk(spark, sf_dir):
    """§2.6 ORDER BY + LIMIT (watermark-scan ordering analog, S6)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id", "value")
    )


def q_salted_agg(spark, sf_dir):
    """§4.2 skew salting: two-phase salted aggregation must equal the
    plain groupBy (oracle is the unsalted SQL)."""
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(16))
    )
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count("*").alias("n"), F.max("value").alias("mx")
    )
    return partial.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.round(F.max("mx"), 2).alias("max_value"),
    )


# --------------------------------------------------------------------------
# Transform / function surface (SURVEY §2.2, §2.3)
# --------------------------------------------------------------------------

def q_sha256_content(spark, sf_dir):
    """T5/A7 + north-star invariant: vectorized sha2(content, 256)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2(F.col("text"), 256).alias("content_sha256"))


def q_sanitize_names(spark, sf_dir):
    """T7 key sanitation: lowercase, non-alnum → '_' (ids.rs:229-257
    to_container_name analog)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.lower(F.concat_ws("-", "lang", "source")), "[^a-z0-9]", "_"
        ).alias("table_name"),
    )


def q_uid_split(spark, sf_dir):
    """T8 UID parse/split (ids.rs:131-144): extract numeric id from a
    composite string key."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", "([0-9]+)", 1).cast("int").alias("src_num"),
    )


def q_redact(spark, sf_dir):
    """A4 redaction: regexp_replace match → [REDACTED_<CAT>]."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.substring("text", 1, 120), "[0-9]+", "[REDACTED_NUM]"
        ).alias("redacted"),
    )


def q_tokenize_hash(spark, sf_dir):
    """A5 tokenization strategy, deterministic variant: CAT_<hash>
    (stateful RNG replaced by a content hash so replays reproduce)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(F.lit("SRC_"), F.md5(F.col("source"))).alias("token"),
    )


def q_detect_counts(spark, sf_dir):
    """A2/A9 detection report: per-category match counts + percentile
    (groupBy + regexp counting, the dry-run report analog)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("hits", F.regexp_count(F.col("text"), F.lit("data")))
        .groupBy("lang")
        .agg(
            F.sum("hits").alias("total_hits"),
            F.count("*").alias("n_docs"),
        )
    )


# --------------------------------------------------------------------------
# Training-data pipeline: dedup / similarity / text analysis
# --------------------------------------------------------------------------

def _words(col="text"):
    return F.split(F.col(col), " ")


# NOTE on higher-order functions: building several python-lambda HOFs
# (F.transform(..., lambda x: ...)) into ONE plan makes their named
# lambda variables collide in PySpark 4.1 (observed: nondeterministic
# minhash values).  SQL-parsed lambdas via F.expr scope correctly, so
# every multi-lambda expression here is written as SQL.
#
# Word-array BINDING trick: ``transform(array(split(...)), ws -> BODY)
# [1]`` evaluates split() ONCE per row and exposes it as the lambda var
# ``ws``; spelling split() inline instead makes Catalyst re-evaluate it
# inside every element_at of the shingle lambda — O(words²) per row
# (measured at sf0.1: q_minhash_signature 3.3 s → 0.22 s,
# q_ngram_jaccard 10.5 s → 2.3 s after binding).
# cap on members per LSH band: bounds the collect_list aggregation
# buffer (and the pair explosion, |band|²) when a pathological corpus
# collapses into one band.  Oversized bands are DROPPED — recall
# degrades instead of an executor OOM.  Mirrored into the DuckDB
# oracles so the capped semantics stay checkable.
_MAX_BAND = 10_000

_SHINGLE_EXPR = (
    "element_at(transform(array(split({col}, ' ')), ws -> "
    "CASE WHEN size(ws) >= 3 THEN "
    "transform(sequence(1, size(ws) - 2), "
    "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1), "
    "element_at(ws, i+2))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END), 1)"
)


def _shingles(col="text"):
    """Word 3-shingles, 1-based indexing to mirror the SQL oracle."""
    return F.expr(_SHINGLE_EXPR.format(col=col))


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep min doc_id."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
    )


# MinHash family k over a bound distinct-shingle array `shd`
def _mh(k: int, arr: str = "shd") -> str:
    return f"array_min(transform({arr}, x -> md5(concat('{k}', x))))"


# All 4 family minima from ONE bound shingle array (split + shingling
# evaluated once per row; min over duplicates == min over distinct, so
# folding over DISTINCT shingles is value-identical to r01's raw fold).
_MINHASH_STRUCT = (
    "element_at(transform(array(array_distinct({sh})), shd -> "
    "named_struct(" + ", ".join(f"'mh{k}', {_mh(k)}" for k in range(4))
    + ")), 1)"
)


def q_minhash_signature(spark, sf_dir):
    """MinHash signatures (4 hash families) over word 3-shingles —
    shingle → md5(seed||shingle) → min; the LSH building block.
    One bound shingle evaluation per row (see _SHINGLE_EXPR note).
    Round 8: _tp spreads the md5-family fold across cores (the
    single-row-group scan ran it in one task — 6.8 s → 0.65 s at the
    1M-row scale shape)."""
    d = _tp(spark, sf_dir, "documents")
    sig = F.expr(_MINHASH_STRUCT.format(sh=_SHINGLE_EXPR.format(col="text")))
    out = d.select("doc_id", sig.alias("_sig"))
    return out.select("doc_id", *[
        F.col(f"_sig.mh{k}").alias(f"mh{k}") for k in range(4)
    ])


def q_lsh_candidate_pairs(spark, sf_dir):
    """LSH banding: docs sharing a band signature become candidate
    near-dup pairs.  GROUP-BY-BAND formulation: one scan computes the
    band key, one shuffle groups doc ids per band, pairs enumerate
    inside each group — a band self-JOIN would scan + shingle the
    corpus twice (HOF lambdas defeat exchange-reuse canonicalization;
    verified empirically).  Never an O(n²) compare: work is
    Σ |band|², and single-member bands are dropped before the explode.

    Skew note (100 TB): a corpus with thousands of byte-identical docs
    makes one giant band — run exact dedup FIRST (dedupe_corpus does),
    or cap band size; the oracle-equivalent join has the same skew.
    NULL band keys (docs with < 3 words) are filtered, matching SQL
    join semantics where NULL = NULL is false.  Round 8: that filter
    runs on the raw text (``size(split) >= 3`` ⟺ mh0 non-NULL)
    BEFORE the projection — filtering on the computed ``mh0`` let
    PushDownPredicate substitute the alias below the Project and
    re-evaluate the whole shingle+md5 fold per row for the filter
    (see q_ngram_jaccard; same fix, measured there)."""
    d = _tp(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    shd = f"array_distinct({_SHINGLE_EXPR.format(col='text')})"
    sig = d.select("doc_id", F.expr(_mh(0, shd)).alias("mh0"))
    # band-size cap: a pathological band (constant/boilerplate corpus
    # surviving exact dedup) would otherwise materialize one giant
    # aggregation buffer row — degrade recall instead of OOMing; the
    # oracle applies the identical cap so semantics stay checkable
    g = sig.groupBy("mh0").agg(F.collect_list("doc_id").alias("ids")).filter(
        (F.size("ids") >= 2) & (F.size("ids") <= _MAX_BAND)
    )
    return (
        g.select(F.explode("ids").alias("doc_a"), F.col("ids"))
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def q_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard similarity for LSH candidate pairs:
    |A∩B| / |A∪B| over distinct word 3-shingles.

    Same group-by-band shape as q_lsh_candidate_pairs but the groups
    carry (doc_id, shd) structs, so the pair rows already hold both
    shingle sets — ONE scan, ONE shuffle, no hydration join, no cache
    (r01 recomputed shingles ~4× and leaked a cache: 10.5 s; the
    self-join rework: 2.3 s; this shape: ~1.3 s at sf0.1).

    Round 8: three changes, value-identical (oracle unchanged):
    * _tp spreads the shingle projection across cores (single-row-
      group scan — guide §6);
    * ``shd`` and ``mh0`` come out of ONE bound evaluation
      (named_struct inside the binding lambda) — r07 spelled the
      shingle expression twice in the projection and HOF lambdas
      defeat Catalyst's subexpression elimination, so every row paid
      split+shingle+distinct twice;
    * the NULL-band filter runs on the RAW text (``size(split) >= 3``,
      exactly when ``mh0`` is non-NULL) BEFORE the projection — r07
      filtered on the computed ``mh0``, and PushDownPredicate
      substitutes the alias below the Project, re-evaluating the
      whole shingle+md5 expression a second time per row just for the
      filter (measured: 4.0 → 1.9 s at the 50k-doc shape);
    * |A∪B| is derived as |A|+|B|−|A∩B| (exact for distinct arrays)
      instead of materializing ``array_union`` — halves the per-pair
      set work (guide §1.2 "per-task work")."""
    d = _tp(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    sh = _SHINGLE_EXPR.format(col="text")
    both = (
        "element_at(transform(array(array_distinct(" + sh + ")), shd -> "
        "named_struct('shd', shd, 'mh0', "
        "array_min(transform(shd, x -> md5(concat('0', x)))))), 1)"
    )
    rel = d.select("doc_id", F.expr(both).alias("_s")).select(
        "doc_id", F.col("_s.shd").alias("shd"), F.col("_s.mh0").alias("mh0")
    )
    g = rel.groupBy("mh0").agg(
        F.collect_list(F.struct("doc_id", "shd")).alias("ds")
    ).filter((F.size("ds") >= 2) & (F.size("ds") <= _MAX_BAND))
    pairs = (
        g.select(F.explode("ds").alias("a"), F.col("ds"))
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    # two-step projection: `_i` feeds both the numerator and the
    # derived union size — staging it keeps array_intersect evaluated
    # once (CollapseProject refuses to inline a non-cheap expression
    # referenced twice, so the plan keeps two Projects)
    staged = pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.size(F.array_intersect("a.shd", "b.shd")).alias("_i"),
        (F.size("a.shd") + F.size("b.shd")).alias("_sab"),
    )
    return staged.select(
        "doc_a", "doc_b",
        F.round(F.col("_i") / (F.col("_sab") - F.col("_i")), 4)
        .alias("jaccard"),
    )


def _read_query_vec(spark, sf_dir: str, vec_id: int = 0) -> list[float]:
    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        import pyarrow.dataset as ds

        tbl = ds.dataset(path).to_table(
            columns=["embedding"], filter=ds.field("vec_id") == vec_id
        )
        return [float(v) for v in tbl["embedding"][0].as_py()]
    except Exception:  # non-local FS / missing pyarrow: the Spark path
        e = _t(spark, sf_dir, "embeddings")
        return [
            float(v)
            for v in e.filter(F.col("vec_id") == vec_id)
            .select(F.col("embedding").cast("array<double>").alias("q"))
            .collect()[0]["q"]
        ]


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine similarity vs a query vector (ANN baseline).
    Dot product via zip_with + aggregate — built-in higher-order
    functions, no UDF.  Threshold filter (not rank) so float rounding
    can't flip rows at a rank boundary."""
    # Round 8: the query vector is ONE row of input — a pyarrow read
    # replaces the scheduled Spark collect job (~0.15 s of driver-
    # serialized latency per invocation) with a ~10 ms local read;
    # identical bytes from the identical parquet.  Falls back to the
    # Spark collect for non-local paths.
    qvec = _read_query_vec(spark, sf_dir)
    qlit = "array(" + ", ".join(repr(float(v)) + "D" for v in qvec) + ")"
    # Round 8: the query norm is a CONSTANT, but spelled as an
    # aggregate-over-literal HOF Catalyst will not constant-fold — r07
    # re-folded the 64-element literal for every row.  Reproduce the
    # identical IEEE double here (same 0.0 seed, same left-to-right
    # (acc + v*v) fold, same sqrt) and inline it as a literal.
    qn = 0.0
    for v in qvec:
        qn += float(v) * float(v)
    qn = math.sqrt(qn)
    cos = F.expr(
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), " + qlit + ", "
        "(x, y) -> x * y), 0.0D, (acc, v) -> acc + v) / "
        "(sqrt(aggregate(CAST(embedding AS ARRAY<DOUBLE>), 0.0D, "
        "(acc, v) -> acc + v * v)) * " + repr(qn) + "D)"
    )
    ep = _t(spark, sf_dir, "embeddings")
    # explode(array(·)) is a 1:1 Generate barrier: the threshold
    # filter on the COMPUTED cos_sim would otherwise be pushed below
    # the Project by PushDownPredicate (alias substitution) and
    # re-evaluate the whole cosine fold a second time per row; a
    # Generate's output column cannot be pushed through (plan check:
    # one zip_with, not two).
    return (
        ep.select("vec_id",
                  F.explode(F.array(F.round(cos, 3))).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.2)
        .filter(F.col("vec_id") != 0)
    )


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: vectors within cosine ≥ 0.5 of
    each other (bounded to vec_id < 200 so the SQL oracle's pair join
    stays small; at scale the IVF cell id bounds the join instead)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = e.select(F.col("vec_id").alias("id_a"),
                 F.col("embedding").cast("array<double>").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"),
                 F.col("embedding").cast("array<double>").alias("eb"))
    dot = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    )
    na = F.expr("sqrt(aggregate(ea, 0.0D, (acc, v) -> acc + v * v))")
    nb = F.expr("sqrt(aggregate(eb, 0.0D, (acc, v) -> acc + v * v))")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        # 1:1 Generate barrier — single cosine evaluation under the
        # threshold filter (round 8; see q_embedding_topk)
        .withColumn(
            "cos_sim", F.explode(F.array(F.round(dot / (na * nb), 3)))
        )
        .filter(F.col("cos_sim") >= 0.3)
        .select("id_a", "id_b", "cos_sim")
    )


def q_embedding_neardup_ivf(spark, sf_dir):
    """Embedding near-dup pairs the SCALE way: candidates only from a
    self-join ON the IVF cell id (never a cartesian product — compare
    q_embedding_neardup, which is the deliberately-bounded oracle demo
    of the same values).  lowid centroids + 6-dp-rounded argmax keep
    the cell assignment DuckDB-reproducible, so this one is fully
    oracle-checked end-to-end — INCLUDING the max_cell_size skew cap
    (VERDICT r03 #3): 40 binds at sf0.01 (the largest cell holds 42
    vectors), so the oracle proves the capped path, not just the happy
    path.  The oracle mirrors the cap with a HAVING on per-cell
    counts."""
    from .similarity import embedding_neardups_ivf

    e = _t(spark, sf_dir, "embeddings")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the cap warning is expected here
        return embedding_neardups_ivf(
            e, threshold=0.3, n_cells=16, centroids="lowid",
            nprobe=1, max_cell_size=40,
        )


def q_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex tokens."""
    d = _tp(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0
            )
        ).alias("bpe_tokens"),
    )


def q_quality_score(spark, sf_dir):
    """Quality scoring: length / mean-word-length / stopword-ratio
    heuristics (training-data filtering staple)."""
    d = _tp(spark, sf_dir, "documents")
    n_words = F.size(_words())
    stop_hits = F.regexp_count(F.col("text"), F.lit("(^| )(the|a)( |$)"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        n_words.alias("n_words"),
        F.round(F.length("text") / n_words, 3).alias("mean_wlen"),
        F.round(stop_hits / n_words, 4).alias("stop_ratio"),
    )


def q_langid(spark, sf_dir):
    """Language-ID heuristic: stopword-hit scoring, argmax by CASE —
    demo shape (the synthetic corpus's lang column is the label)."""
    d = _tp(spark, sf_dir, "documents")
    en = F.regexp_count(F.col("text"), F.lit("(^| )(the|a|row|data)( |$)"))
    return d.select(
        "doc_id",
        "lang",
        F.when(en >= 3, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def q_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over the sorted distinct vocabulary
    (word-set normalization — order-insensitive near-dup key)."""
    d = _tp(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(_words())))
        ).alias("vocab_fp"),
    )


def q_cdc_fold(spark, sf_dir):
    """The engine's MERGE semantics as one SQL-expressible query:
    last-writer-wins per key (user_id) with delete folding — a final
    'error' event acts as the tombstone (op='D' analog).  This is the
    oracle-checkable twin of LakehouseSink.merge's window+guard."""
    # Round 8: same max(struct) aggregate fold as q_lww_latest (the
    # window shipped+sorted every event; the aggregate partial-
    # aggregates map-side and picks the identical winner — struct
    # ordering = the window's ORDER BY because event_id is unique).
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.max(F.struct(
            F.col("ts"), F.col("event_id"), F.col("event_type")
        )).alias("_w"))
        .filter(F.col("_w.event_type") != "error")  # tombstoned keys drop
        .select(
            "user_id",
            F.col("_w.event_id").alias("last_event_id"),
            F.col("_w.event_type").alias("last_type"),
        )
    )


def q_state_diff(spark, sf_dir):
    """Change-data-feed semantics as one SQL-expressible query — the
    oracle-checkable twin of ``LakehouseSink.diff`` (snapshot I/U/D):
    fold the event stream to per-key LWW state at two watermarks
    (event_id < 5000 vs all), full-outer join on the key, classify:

    * I — live at W2 only; U — live at both with a different last
      event; D — live at W1, tombstoned (final 'error') at W2.
    D rows carry NULL state columns, mirroring the sink's tombstones.

    Round 8 (guide §2.4 "remove shuffles outright"): r07 folded each
    snapshot with its own window (two scans, two full-width hash
    exchanges + sorts) and full-outer-joined them (a third exchange
    pair).  Both snapshots are conditional aggregates over the SAME
    scan: ``max(when(event_id < 5000, struct(…)))`` is the W1 winner,
    ``max(struct(…))`` the W2 winner — one scan, one partial-agg
    exchange, no join.  A user with no W1 events aggregates ``_o`` to
    NULL, which is exactly the full-outer-miss the old join produced
    (``coalesce(NULL ≠ 'error', false)`` = not-live).  Plan diff:
    2×(Exchange+Sort+Window) + SortMergeJoin → one partial/final
    SortAggregate pair and no join (struct buffers aren't
    hash-aggregable; the win is one scan, one narrow-keyed exchange)
    (0.99 s → 0.56 s at the 1M-row scale shape, value-identical)."""
    ev = _events(spark, sf_dir)
    g = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_id") < 5000, F.struct(
            F.col("ts"), F.col("event_id"), F.col("event_type")
        ))).alias("_o"),
        F.max(F.struct(
            F.col("ts"), F.col("event_id"), F.col("event_type")
        )).alias("_n"),
    )
    o_live = F.coalesce(F.col("_o.event_type") != "error", F.lit(False))
    n_live = F.coalesce(F.col("_n.event_type") != "error", F.lit(False))
    change = (
        F.when(~o_live & n_live, F.lit("I"))
        .when(
            o_live & n_live
            & (F.col("_o.event_id") != F.col("_n.event_id")),
            F.lit("U"),
        )
        .when(o_live & ~n_live, F.lit("D"))
    )
    live_or_null = lambda c: F.when(  # noqa: E731
        F.col("_change") != "D", F.col(c)
    )
    return (
        g.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(
            F.col("_change").alias("change"),
            "user_id",
            live_or_null("_n.event_id").alias("last_event_id"),
            live_or_null("_n.event_type").alias("last_type"),
        )
    )


def q_cdf_emit(spark, sf_dir):
    """First-class CDF emit (VERDICT r05 #7) under the driver's hash
    gate: run the ACTUAL ``emit_changes=True`` merge path — two epochs
    of a changelog derived deterministically from the events table —
    and return the second epoch's emitted change feed, read back from
    the ``_changes/epoch=000001`` parquet the commit wrote.

    The emitted feed and ``diff(v-1, v)`` share one classifier
    (``LakehouseSink._change_rows``, equal row-for-row by
    ``test_emitted_cdf_matches_diff_on_multiepoch_replay``), so the
    oracle expresses the snapshot diff in SQL: LWW fold at the epoch
    boundary (seq < 5000) vs the final fold, joined on the key, I/U/D
    by liveness + content-sha change — byte-identical re-upserts are
    NOT changes, tombstones null the payload and its sha, pre-image
    identity (``_pre_content_sha256``/``_pre_seq``) comes from the
    prior fold.  Every epoch-2 seq exceeds every epoch-1 seq, so the
    final fold over all events equals the fenced two-epoch replay
    state.  ``localCheckpoint`` detaches the result from the temp
    table dir before cleanup."""
    import shutil
    import tempfile

    from ..sinks import LakehouseSink

    ev = _events(spark, sf_dir)
    cl = _cdf_changelog(ev)
    root = tempfile.mkdtemp(prefix="atlas_q_cdf_")
    try:
        sink = LakehouseSink(spark, root, n_buckets=8, emit_changes=True)
        sink.ensure()
        sink.merge(cl.filter(F.col("seq") < 5000), 0)
        sink.merge(cl.filter(F.col("seq") >= 5000), 1)
        return (
            sink.changes(1)
            .select(
                "_change", "repo", "path",
                "_pre_content_sha256", "_pre_seq",
                "seq", "commit", "lang", "content", "content_sha256",
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_cdf_backfill(spark, sf_dir):
    """Commit→emit crash recovery (VERDICT r06 #3) under the driver's
    hash gate: run the same two-epoch ``emit_changes`` replay as
    ``q_cdf_emit``, then SIMULATE the kill window by deleting epoch 1's
    emitted feed dir, run ``backfill_changes()`` (the resume-path
    repair), and return the REGENERATED feed.  It must hash-match the
    same oracle as the emitted one — the regeneration path
    (version-pair snapshots through the shared classifier) and the
    emit path are interchangeable by construction."""
    import os
    import shutil
    import tempfile

    from ..sinks import LakehouseSink

    ev = _events(spark, sf_dir)
    cl = _cdf_changelog(ev)
    root = tempfile.mkdtemp(prefix="atlas_q_cdfbf_")
    try:
        sink = LakehouseSink(spark, root, n_buckets=8, emit_changes=True)
        sink.ensure()
        sink.merge(cl.filter(F.col("seq") < 5000), 0)
        sink.merge(cl.filter(F.col("seq") >= 5000), 1)
        # the crash window: commit durable, feed lost
        shutil.rmtree(os.path.join(root, "_changes/epoch=000001"))
        repaired = sink.backfill_changes()
        assert repaired == [1], repaired
        return (
            sink.changes(1)
            .select(
                "_change", "repo", "path",
                "_pre_content_sha256", "_pre_seq",
                "seq", "commit", "lang", "content", "content_sha256",
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_cdf_incremental_agg(spark, sf_dir):
    """Incremental materialized-view maintenance from the change feed
    (round 7) under the driver's hash gate: replay the same two-epoch
    changelog as ``q_cdf_emit`` with the full pre-image feed
    (``cdf_preimage=True``), fold BOTH epochs' feeds through
    ``IncrementalAggView`` (I adds post, D retracts pre, U does both —
    never a base-table scan), and return the per-repo aggregate.  The
    oracle computes the same aggregate DIRECTLY over the final LWW
    live state — so any defect in the pre-image, the delta algebra, or
    the fold breaks the hash.  Measures are distributive (count + sum
    of content length), the only class the operator admits."""
    import shutil
    import tempfile

    from ..operators.incremental import IncrementalAggView
    from ..sinks import LakehouseSink

    ev = _events(spark, sf_dir)
    cl = _cdf_changelog(ev)
    root = tempfile.mkdtemp(prefix="atlas_q_cdfia_")
    vdir = tempfile.mkdtemp(prefix="atlas_q_cdfia_v_")
    try:
        sink = LakehouseSink(spark, root, n_buckets=8,
                             emit_changes=True, cdf_preimage=True)
        sink.ensure()
        sink.merge(cl.filter(F.col("seq") < 5000), 0)
        sink.merge(cl.filter(F.col("seq") >= 5000), 1)
        view = IncrementalAggView(
            spark, vdir, ["repo"],
            {"total_chars": lambda c: F.length(c("content"))},
            count_col="n_paths",
        )
        applied = view.refresh(sink)["applied_epochs"]
        assert applied == [0, 1], applied
        return view.state().localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(vdir, ignore_errors=True)


def q_feed_replica(spark, sf_dir):
    """CDC fan-out under the driver's hash gate: replay the two-epoch
    changelog into a source table with the feed on, rebuild a REPLICA
    from nothing but the emitted feeds (``operators/replicate.py``),
    and return the replica's live state.  The oracle computes the
    SOURCE's final LWW live state directly — so the feed's
    completeness (nothing dropped, nothing misclassified, tombstones
    and late-but-older ordering preserved) is what the hash checks.
    ``content`` is salted with the event id so no two events of a key
    are byte-identical — the classifier's identical-bytes-is-no-change
    rule would otherwise let replica bookkeeping columns legitimately
    lag (documented contract boundary in replicate.py), which is a
    semantic choice, not the completeness property this row gates."""
    import shutil
    import tempfile

    from ..operators.replicate import replicate
    from ..sinks import LakehouseSink

    ev = _events(spark, sf_dir)
    cl = _cdf_changelog(ev, salt_content=True)
    sroot = tempfile.mkdtemp(prefix="atlas_q_repl_s_")
    droot = tempfile.mkdtemp(prefix="atlas_q_repl_d_")
    try:
        src = LakehouseSink(spark, sroot, n_buckets=8, emit_changes=True)
        src.ensure()
        src.merge(cl.filter(F.col("seq") < 5000), 0)
        src.merge(cl.filter(F.col("seq") >= 5000), 1)
        dst = LakehouseSink(spark, droot, n_buckets=8)
        dst.ensure()
        out = replicate(src, dst)
        assert out["applied_epochs"] == [0, 1], out
        return (
            dst.read()
            .select("repo", "path", "seq", "commit", "lang",
                    "content", "content_sha256")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(sroot, ignore_errors=True)
        shutil.rmtree(droot, ignore_errors=True)


def q_nested_evolution(spark, sf_dir):
    """Nested-payload schema evolution (VERDICT r05 #6) under the
    driver's hash gate: dotted-path typed columns over a nested JSON
    payload — a subfield appearing MID-STREAM (absent → null) and a
    nested RENAME (``meta.d0`` → ``meta.depth``, surfaced via the
    coalesce lookup ``project()`` builds).  The payload is synthesized
    deterministically from the events table with integer-only leaves
    (so the oracle reconstructs expected values with plain arithmetic,
    no cross-engine float formatting); the Spark side runs the REAL
    engine path — one ``from_json`` map decode, nested leaves read as
    JSON text via ``get_json_object`` over the map entry
    (``plans/schema_evolution.py``).  Rows < 2500 carry the old name
    ``meta.d0``, rows in [2500, 5000) carry no ``meta`` at all, rows
    ≥ 5000 carry ``meta.depth`` — add, absence, and rename in one
    stream."""
    from ..plans.schema_evolution import SchemaRules

    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k")
    depth = (F.col("event_id") % 7).cast("string")
    payload = (
        F.when(
            F.col("event_id") < 2500,
            F.concat(F.lit('{"k": '), k,
                     F.lit(', "meta": {"d0": '), depth, F.lit("}}")),
        )
        .when(
            F.col("event_id") >= 5000,
            F.concat(F.lit('{"k": '), k,
                     F.lit(', "meta": {"depth": '), depth, F.lit("}}")),
        )
        .otherwise(F.concat(F.lit('{"k": '), k, F.lit("}")))
    )
    rules = SchemaRules(
        renames={"meta.d0": "meta.depth"},
        typed_columns={"k": "bigint", "meta.depth": "bigint"},
    )
    df = ev.withColumn(
        "_payload_map", F.from_json(payload, "map<string,string>")
    )
    return rules.project(df).select("event_id", "k", "meta_depth")


def q_daily_counts(spark, sf_dir):
    """§2.6 date functions: per-day event counts (time_committed
    bucketing analog — watermark cadence reporting)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n"))
    )


def q_base64_key(spark, sf_dir):
    """§2.6 base64 (ehrbase.rs:114-116 basic-auth encode analog)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.encode(F.concat_ws(":", "lang", "source"), "utf-8")).alias("b64"),
    )


def q_format_key(spark, sf_dir):
    """§2.6 concat/format: the '{template}_{ehr}' watermark id
    (watermark.rs:92-94) recast as '{lang}_{source}'."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.concat_ws("_", "lang", "source").alias("wm_id")
    )


def q_percentile_nchars(spark, sf_dir):
    """A9 timing-percentile analog: exact interpolated percentiles of
    doc length per lang (Spark `percentile` == DuckDB quantile_cont)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 1).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 1).alias("p90"),
    )


def q_topn_per_group(spark, sf_dir):
    """§2.6 window rank: top-3 events by value per event_type."""
    ev = _tp(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
    )


# --------------------------------------------------------------------------
# non-SQL-expressible ops (no DuckDB oracle → driver rows-only check;
# each has a python-oracle pytest in tests/test_training_ops.py)
# --------------------------------------------------------------------------

def q_simhash(spark, sf_dir):
    """16-bit SimHash fingerprints (columnar fold).  Uses the md5_16
    word-hash family so the DuckDB oracle can recompute the EXACT bits
    (md5 + instr nibble arithmetic exists in both engines); the crc32
    family keeps its python-oracle pytest in test_training_ops.py."""
    from .similarity import simhash16

    d = _tp(spark, sf_dir, "documents")
    return simhash16(d, "text", word_hash="md5_16").select(
        "doc_id", "simhash"
    )


def q_ivf_ann(spark, sf_dir):
    """IVF-style ANN: probe 4 of 16 coarse cells, exact cosine inside —
    the partition-pruned scale path for similarity search.  Threshold
    (not top-k) output + 6-dp-rounded cell argmax make the result
    oracle-reproducible in DuckDB (no rank boundary to flip)."""
    from .similarity import IvfIndex

    e = _t(spark, sf_dir, "embeddings")
    q = _read_query_vec(spark, sf_dir)
    idx = IvfIndex(n_cells=16, nprobe=4)
    idx.build(e)
    return idx.search_threshold(q, threshold=0.2, exclude_id=0)


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload + typed metadata →
    mapInPandas feature extraction (stub codec, real batching)."""
    from .multimodal import attach_media, extract_features

    d = _t(spark, sf_dir, "documents")
    return extract_features(attach_media(d, "text", "doc_id"))


def q_anonymize_report(spark, sf_dir):
    """A9 dry-run detection report over the documents corpus."""
    from ..anonymize import Anonymizer

    d = _t(spark, sf_dir, "documents")
    return Anonymizer(categories=["EMAIL", "URL", "DATE", "ZIP"]).report(
        d.select(F.col("text")), "text"
    )


def q_detect_entities(spark, sf_dir):
    """A2 per-detection entity rows — category, SPAN (start/end),
    confidence, hashed value.

    The synthetic corpus contains no PII-shaped tokens, so the query
    enriches each doc with deterministic per-row contact lines (same
    construction in the oracle SQL) — every category fires with values
    that vary per row, making the hash compare non-vacuous.  Because
    the planted PII sits at FIXED offsets from ``length(text)``, the
    spans the pandas-UDF detector reports are DuckDB-computable with
    pure string arithmetic (VERDICT r02 #7) — DuckDB has no
    match-position function, so this construction is what makes the
    span columns oracle-checkable at all.

    Round 8: _tp — the pandas-UDF detector inherited the single-row-
    group scan's ONE partition, so the whole Arrow surface ran in one
    Python worker (2.2 s → 0.85 s at the 50k-doc scale shape)."""
    from ..anonymize import Anonymizer

    d = _tp(spark, sf_dir, "documents").withColumn(
        "_txt",
        F.expr(
            "text || ' reach user' || CAST(doc_id AS STRING) || "
            "'@example.com via https://mirror/' || source || "
            "' on 2024-03-15 zip 90210-1234'"
        ),
    )
    ents = Anonymizer(
        categories=["EMAIL", "URL", "DATE", "ZIP"]
    ).detect_entities(d, "_txt", "doc_id")
    return ents.select("record_key", "category", "start", "end",
                       "confidence", "value_sha256")


def q_replay_anonymized(spark, sf_dir):
    """The composed pipeline as ONE oracle-checkable query (VERDICT
    r03 #8: the 2.1M ev/s quarantine+redaction bench composition had a
    throughput number but no green correctness row): per-key LWW fold
    (documents per ``source``, ``doc_id`` as the seq — the engine's
    MERGE window) → anonymize transform (redact, the four RE2-safe
    categories, planted PII so redaction provably fires) → content
    sha256 over the REDACTED text, the pipeline's per-row invariant.

    In the engine the transform runs per micro-batch BEFORE the merge
    (runner.apply_batch); folding first is result-equivalent because
    redaction is row-deterministic and the fold's key and order don't
    depend on content — this query IS the final replay state."""
    from ..anonymize import Anonymizer

    d = _t(spark, sf_dir, "documents").withColumn(
        "_txt",
        F.expr(
            "text || ' reach user' || CAST(doc_id AS STRING) || "
            "'@example.com via https://mirror/' || source || "
            "' on 2024-03-15 zip 90210-1234'"
        ),
    )
    w = Window.partitionBy("source").orderBy(F.col("doc_id").desc())
    winners = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    anon = Anonymizer(
        categories=["EMAIL", "URL", "DATE", "ZIP"], strategy="redact"
    )
    red = anon.redact(winners, "_txt")
    return red.select(
        "source",
        F.col("doc_id").alias("winner_doc_id"),
        F.col("_txt").alias("content_redacted"),
        F.sha2(F.col("_txt"), 256).alias("content_sha256"),
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_lww_latest": q_lww_latest,
    "q_incremental_scan": q_incremental_scan,
    "q_watermark_agg": q_watermark_agg,
    "q_dedup_pairs": q_dedup_pairs,
    "q_antijoin_verify": q_antijoin_verify,
    "q_point_lookup": q_point_lookup,
    "q_json_extract": q_json_extract,
    "q_orderby_topk": q_orderby_topk,
    "q_salted_agg": q_salted_agg,
    "q_sha256_content": q_sha256_content,
    "q_sanitize_names": q_sanitize_names,
    "q_uid_split": q_uid_split,
    "q_redact": q_redact,
    "q_tokenize_hash": q_tokenize_hash,
    "q_detect_counts": q_detect_counts,
    "q_dedup_exact": q_dedup_exact,
    "q_minhash_signature": q_minhash_signature,
    "q_lsh_candidate_pairs": q_lsh_candidate_pairs,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_embedding_topk": q_embedding_topk,
    "q_embedding_neardup": q_embedding_neardup,
    "q_embedding_neardup_ivf": q_embedding_neardup_ivf,
    "q_token_count": q_token_count,
    "q_quality_score": q_quality_score,
    "q_langid": q_langid,
    "q_fingerprint": q_fingerprint,
    "q_cdc_fold": q_cdc_fold,
    "q_state_diff": q_state_diff,
    "q_cdf_emit": q_cdf_emit,
    "q_cdf_backfill": q_cdf_backfill,
    "q_cdf_incremental_agg": q_cdf_incremental_agg,
    "q_feed_replica": q_feed_replica,
    "q_nested_evolution": q_nested_evolution,
    "q_daily_counts": q_daily_counts,
    "q_base64_key": q_base64_key,
    "q_format_key": q_format_key,
    "q_percentile_nchars": q_percentile_nchars,
    "q_topn_per_group": q_topn_per_group,
    "q_simhash": q_simhash,
    "q_ivf_ann": q_ivf_ann,
    "q_media_features": q_media_features,
    "q_anonymize_report": q_anonymize_report,
    "q_detect_entities": q_detect_entities,
    "q_replay_anonymized": q_replay_anonymized,
}

_SHINGLE_SQL = (
    "list_transform(generate_series(1, greatest(len({w}) - 2, 0)), "
    "i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2])"
)

ORACLES: dict[str, str] = {
    "q_lww_latest": """
        SELECT user_id, event_id AS last_event_id, event_type AS last_type,
               value AS last_value, epoch_us(ts) AS last_ts_us
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events
        ) WHERE rn = 1
    """,
    "q_incremental_scan": """
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        FROM events WHERE ts > TIMESTAMP '2024-01-03 00:00:00'
    """,
    "q_watermark_agg": """
        SELECT user_id, epoch_us(max(ts)) AS max_ts_us, count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "q_dedup_pairs": "SELECT DISTINCT user_id, event_type FROM events",
    "q_antijoin_verify": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
    """,
    "q_point_lookup": """
        SELECT event_id, event_type, value FROM events WHERE user_id = 7
    """,
    "q_json_extract": """
        SELECT json_extract_string(props, '$.k')::INT AS k_val,
               count(*) AS n, (sum(value::DECIMAL(18,2)))::DOUBLE AS sum_value
        FROM events GROUP BY 1
    """,
    "q_orderby_topk": """
        SELECT event_id, value FROM events
        ORDER BY value DESC, event_id ASC LIMIT 100
    """,
    "q_salted_agg": """
        SELECT event_type, count(*) AS n_events,
               round(max(value), 2) AS max_value
        FROM events GROUP BY event_type
    """,
    "q_sha256_content": """
        SELECT doc_id, sha256(text) AS content_sha256 FROM documents
    """,
    "q_sanitize_names": """
        SELECT doc_id,
               regexp_replace(lower(lang || '-' || source),
                              '[^a-z0-9]', '_', 'g') AS table_name
        FROM documents
    """,
    "q_uid_split": """
        SELECT doc_id, regexp_extract(source, '([0-9]+)', 1)::INT AS src_num
        FROM documents
    """,
    "q_redact": """
        SELECT doc_id,
               regexp_replace(substr(text, 1, 120), '[0-9]+',
                              '[REDACTED_NUM]', 'g') AS redacted
        FROM documents
    """,
    "q_tokenize_hash": """
        SELECT doc_id, 'SRC_' || md5(source) AS token FROM documents
    """,
    "q_detect_counts": """
        SELECT lang,
               sum(len(regexp_extract_all(text, 'data')))::BIGINT AS total_hits,
               count(*) AS n_docs
        FROM documents GROUP BY lang
    """,
    "q_dedup_exact": """
        SELECT md5(text) AS fp, min(doc_id) AS keeper,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "q_minhash_signature": f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        s AS (SELECT doc_id, {_SHINGLE_SQL.format(w='w')} sh FROM t)
        SELECT doc_id,
               list_min(list_transform(sh, x -> md5('0' || x))) AS mh0,
               list_min(list_transform(sh, x -> md5('1' || x))) AS mh1,
               list_min(list_transform(sh, x -> md5('2' || x))) AS mh2,
               list_min(list_transform(sh, x -> md5('3' || x))) AS mh3
        FROM s
    """,
    "q_lsh_candidate_pairs": f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        s AS (SELECT doc_id,
                     list_min(list_transform({_SHINGLE_SQL.format(w='w')},
                                             x -> md5('0' || x))) mh0
              FROM t)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM s a JOIN s b ON a.mh0 = b.mh0 AND a.doc_id < b.doc_id
        WHERE a.mh0 IN (SELECT mh0 FROM s GROUP BY mh0
                        HAVING count(*) <= {_MAX_BAND})
    """,
    "q_ngram_jaccard": f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        s AS (SELECT doc_id, list_distinct({_SHINGLE_SQL.format(w='w')}) sh,
                     list_min(list_transform({_SHINGLE_SQL.format(w='w')},
                                             x -> md5('0' || x))) mh0
              FROM t)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                     len(list_distinct(a.sh || b.sh)), 4) AS jaccard
        FROM s a JOIN s b ON a.mh0 = b.mh0 AND a.doc_id < b.doc_id
        WHERE a.mh0 IN (SELECT mh0 FROM s GROUP BY mh0
                        HAVING count(*) <= {_MAX_BAND})
    """,
    "q_embedding_topk": """
        WITH q AS (SELECT embedding::DOUBLE[] qe FROM embeddings WHERE vec_id = 0),
        s AS (
          SELECT vec_id,
                 round(list_inner_product(embedding::DOUBLE[], (SELECT qe FROM q)) /
                       (sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                        sqrt(list_inner_product((SELECT qe FROM q), (SELECT qe FROM q)))),
                       3) AS cos_sim
          FROM embeddings WHERE vec_id != 0
        )
        SELECT vec_id, cos_sim FROM s WHERE cos_sim >= 0.2
    """,
    "q_embedding_neardup": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
                   WHERE vec_id < 200)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_inner_product(a.v, b.v) /
                     (sqrt(list_inner_product(a.v, a.v)) *
                      sqrt(list_inner_product(b.v, b.v))), 3) AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_inner_product(a.v, b.v) /
                    (sqrt(list_inner_product(a.v, a.v)) *
                     sqrt(list_inner_product(b.v, b.v))), 3) >= 0.3
    """,
    "q_token_count": """
        SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_tokens
        FROM documents
    """,
    "q_quality_score": """
        SELECT doc_id, length(text) AS n_chars_m,
               len(string_split(text, ' ')) AS n_words,
               round(length(text)::DOUBLE / len(string_split(text, ' ')), 3)
                 AS mean_wlen,
               round(len(regexp_extract_all(text, '(^| )(the|a)( |$)'))::DOUBLE
                     / len(string_split(text, ' ')), 4) AS stop_ratio
        FROM documents
    """,
    "q_langid": """
        SELECT doc_id, lang,
               CASE WHEN len(regexp_extract_all(text,
                    '(^| )(the|a|row|data)( |$)')) >= 3
                    THEN 'en' ELSE 'other' END AS lang_pred
        FROM documents
    """,
    "q_fingerprint": """
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS vocab_fp
        FROM documents
    """,
    "q_state_diff": """
        WITH s1 AS (SELECT user_id, event_id, ts, event_type,
                           row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) rn
                    FROM events WHERE event_id < 5000),
        o AS (SELECT user_id, event_id,
                     (event_type != 'error') AS live
              FROM s1 WHERE rn = 1),
        s2 AS (SELECT user_id, event_id, ts, event_type,
                      row_number() OVER (PARTITION BY user_id
                          ORDER BY ts DESC, event_id DESC) rn
               FROM events),
        n AS (SELECT user_id, event_id, event_type,
                     (event_type != 'error') AS live
              FROM s2 WHERE rn = 1),
        j AS (SELECT coalesce(o.user_id, n.user_id) AS user_id,
                     o.event_id AS oe, coalesce(o.live, false) AS ol,
                     n.event_id AS ne, n.event_type AS nt,
                     coalesce(n.live, false) AS nl
              FROM o FULL OUTER JOIN n ON o.user_id = n.user_id),
        c AS (SELECT *,
                     CASE WHEN NOT ol AND nl THEN 'I'
                          WHEN ol AND nl AND oe != ne THEN 'U'
                          WHEN ol AND NOT nl THEN 'D' END AS change
              FROM j)
        SELECT change, user_id,
               CASE WHEN change != 'D' THEN ne END AS last_event_id,
               CASE WHEN change != 'D' THEN nt END AS last_type
        FROM c WHERE change IS NOT NULL
    """,
    "q_cdf_emit": """
        WITH cl AS (
          SELECT event_id AS seq,
                 (event_type = 'error') AS del,
                 'r' || CAST(user_id % 8 AS VARCHAR) AS repo,
                 'u' || CAST(user_id AS VARCHAR) AS path,
                 'c' || CAST(event_id AS VARCHAR) AS cmt,
                 event_type AS lang,
                 props AS content
          FROM events),
        o AS (SELECT repo, path, seq, del,
                     CASE WHEN del THEN NULL
                          ELSE sha256(content) END AS sha
              FROM (SELECT cl.*, row_number() OVER (
                        PARTITION BY repo, path ORDER BY seq DESC) rn
                    FROM cl WHERE seq < 5000) WHERE rn = 1),
        n AS (SELECT repo, path, seq, del,
                     CASE WHEN del THEN NULL ELSE cmt END AS cmt,
                     CASE WHEN del THEN NULL ELSE lang END AS lang,
                     CASE WHEN del THEN NULL ELSE content END AS content,
                     CASE WHEN del THEN NULL
                          ELSE sha256(content) END AS sha
              FROM (SELECT cl.*, row_number() OVER (
                        PARTITION BY repo, path ORDER BY seq DESC) rn
                    FROM cl) WHERE rn = 1),
        j AS (SELECT n.repo, n.path,
                     o.sha AS pre_sha, o.seq AS pre_seq,
                     (o.repo IS NOT NULL AND NOT o.del) AS ol,
                     (NOT n.del) AS nl,
                     o.sha AS osha, n.sha AS nsha,
                     n.seq, n.cmt, n.lang, n.content
              FROM n LEFT JOIN o
                ON n.repo = o.repo AND n.path = o.path),
        c AS (SELECT *,
                     CASE WHEN NOT ol AND nl THEN 'I'
                          WHEN ol AND nl
                               AND (osha IS DISTINCT FROM nsha) THEN 'U'
                          WHEN ol AND NOT nl THEN 'D' END AS chg
              FROM j)
        SELECT chg AS _change, repo, path,
               pre_sha AS _pre_content_sha256,
               pre_seq AS _pre_seq,
               seq, cmt AS "commit", lang, content,
               nsha AS content_sha256
        FROM c WHERE chg IS NOT NULL
    """,
    "q_nested_evolution": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(CASE WHEN event_id < 2500 OR event_id >= 5000
                         THEN event_id % 7 END AS BIGINT) AS meta_depth
        FROM events
    """,
    "q_cdc_fold": """
        SELECT user_id, event_id AS last_event_id,
               event_type AS last_type
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
          FROM events)
        WHERE rn = 1 AND event_type != 'error'
    """,
    "q_daily_counts": """
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1
    """,
    "q_base64_key": """
        SELECT doc_id, to_base64((lang || ':' || source)::BLOB) AS b64
        FROM documents
    """,
    "q_format_key": """
        SELECT doc_id, lang || '_' || source AS wm_id FROM documents
    """,
    "q_percentile_nchars": """
        SELECT lang,
               round(quantile_cont(n_chars, 0.5), 1) AS p50,
               round(quantile_cont(n_chars, 0.9), 1) AS p90
        FROM documents GROUP BY lang
    """,
    "q_topn_per_group": """
        SELECT event_type, rnk, event_id, value FROM (
          SELECT event_type, event_id, value, row_number() OVER (
            PARTITION BY event_type ORDER BY value DESC, event_id ASC) rnk
          FROM events) WHERE rnk <= 3
    """,
}


def _sqlq(pat: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pat.replace("'", "''")


# the backfilled (crash-regenerated) feed must equal the emitted one —
# same oracle by construction (shared classifier; VERDICT r06 #3)
ORACLES["q_cdf_backfill"] = ORACLES["q_cdf_emit"]

# The replica rebuilt purely from emitted feeds must equal the
# source's final LWW live state (computed directly by the oracle) —
# the feed-completeness gate.  Content is event-id-salted so the
# identical-bytes-is-no-change classifier rule cannot apply.
ORACLES["q_feed_replica"] = """
    WITH cl AS (
      SELECT event_id AS seq,
             (event_type = 'error') AS del,
             'r' || CAST(user_id % 8 AS VARCHAR) AS repo,
             'u' || CAST(user_id AS VARCHAR) AS path,
             'c' || CAST(event_id AS VARCHAR) AS cmt,
             event_type AS lang,
             props || '#' || CAST(event_id AS VARCHAR) AS content
      FROM events)
    SELECT repo, path, seq, cmt AS "commit", lang, content,
           sha256(content) AS content_sha256
    FROM (SELECT cl.*, row_number() OVER (
              PARTITION BY repo, path ORDER BY seq DESC) rn
          FROM cl) WHERE rn = 1 AND NOT del
"""

# The incremental view folded from the change feed must equal the same
# aggregate computed directly over the final LWW live state — the
# oracle does it the expensive way (full fold + scan).
ORACLES["q_cdf_incremental_agg"] = """
    WITH cl AS (
      SELECT event_id AS seq,
             (event_type = 'error') AS del,
             'r' || CAST(user_id % 8 AS VARCHAR) AS repo,
             'u' || CAST(user_id AS VARCHAR) AS path,
             props AS content
      FROM events),
    n AS (SELECT repo, path, del, content
          FROM (SELECT cl.*, row_number() OVER (
                    PARTITION BY repo, path ORDER BY seq DESC) rn
                FROM cl) WHERE rn = 1)
    SELECT repo, count(*) AS n_paths,
           CAST(sum(length(content)) AS BIGINT) AS total_chars
    FROM n WHERE NOT del GROUP BY repo
"""

# q_anonymize_report oracle is generated from the SAME pattern registry
# the Spark query uses (atlas_spark.anonymize.PATTERNS), so the two
# sides cannot drift.  The four categories here are RE2-safe (DuckDB)
# and java.util.regex-identical: no lookaround, no backrefs.
from ..anonymize import PATTERNS as _PII  # noqa: E402

_REPORT_CATS = ["EMAIL", "URL", "DATE", "ZIP"]

ORACLES["q_anonymize_report"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS category,
        coalesce(sum(len(regexp_extract_all(text, '{_sqlq(_PII[c])}'))), 0)::BIGINT
          AS total_matches,
        coalesce(sum((len(regexp_extract_all(text, '{_sqlq(_PII[c])}')) > 0)::INT), 0)::BIGINT
          AS docs_with_match
        FROM documents"""
    for c in _REPORT_CATS
)

# DuckDB cosine with rounding (shared by the IVF oracles)
_COS_DD = (
    "round(list_inner_product({a}, {b}) / "
    "(sqrt(list_inner_product({a}, {a})) * "
    "sqrt(list_inner_product({b}, {b}))), {r})"
)

# q_embedding_neardup_ivf oracle: same lowid cell assignment as
# q_ivf_ann, then pairs joined within cell with rounded cosine; the
# `ok` CTE mirrors the Spark side's max_cell_size=40 skew cap (cells
# over the cap are dropped from pairing on both sides).
ORACLES["q_embedding_neardup_ivf"] = f"""
    WITH c AS (SELECT vec_id AS ci, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < 16),
    cells AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                (SELECT ci FROM c
                 ORDER BY {_COS_DD.format(a='c.ce', b='e.embedding::DOUBLE[]', r=6)}
                   DESC, ci
                 LIMIT 1) AS cell
              FROM embeddings e),
    ok AS (SELECT cell FROM cells GROUP BY cell HAVING count(*) <= 40)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS_DD.format(a='a.v', b='b.v', r=3)} AS cos_sim
    FROM cells a JOIN cells b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    JOIN ok ON ok.cell = a.cell
    WHERE {_COS_DD.format(a='a.v', b='b.v', r=3)} >= 0.3
"""

# q_media_features oracle: the stub codec's features are deterministic
# functions of the payload bytes (sha256 digest bytes 0/1 → width/
# height, hexdigest → checksum), so DuckDB can recompute them exactly.
_HX = "'0123456789abcdef'"


def _hexbyte(col: str, pos: int) -> str:
    """SQL for int value of hex byte at 1-based hex-char position."""
    return (
        f"((instr({_HX}, substr({col}, {pos}, 1)) - 1) * 16 + "
        f"instr({_HX}, substr({col}, {pos + 1}, 1)) - 1)"
    )


# q_detect_entities oracle: one UNION ALL branch per category, match
# values unnested and sha256-hashed (never plaintext in the output),
# each row carrying the category's static confidence — same registry
# as the Spark side.
from ..anonymize import CONFIDENCE as _PII_CONF  # noqa: E402

_ENRICH_SQL = (
    "text || ' reach user' || doc_id::VARCHAR || "
    "'@example.com via https://mirror/' || source || "
    "' on 2024-03-15 zip 90210-1234'"
)

# Spans by construction: the planted suffix is
#   ' reach user<id>@example.com via https://mirror/<source>'
#   ' on 2024-03-15 zip 90210-1234'
# so with lt/li/ls = length(text)/length(id)/length(source), every
# category's (start, end) is fixed arithmetic (0-based, end-exclusive —
# Python re.finditer semantics, which the Spark-side pandas UDF emits).
_PII_SPANS = {
    #        value construction                    start            end
    "EMAIL": ("'user' || doc_id::VARCHAR || '@example.com'",
              "lt + 7", "lt + 23 + li"),
    "URL": ("'https://mirror/' || source",
            "lt + 28 + li", "lt + 43 + li + ls"),
    "DATE": ("'2024-03-15'", "lt + 47 + li + ls", "lt + 57 + li + ls"),
    "ZIP": ("'90210-1234'", "lt + 62 + li + ls", "lt + 72 + li + ls"),
}

ORACLES["q_detect_entities"] = "\nUNION ALL\n".join(
    f"""SELECT doc_id AS record_key, '{c}' AS category,
        ({s})::INT AS start, ({e})::INT AS "end",
        {_PII_CONF[c]} AS confidence, sha256({v}) AS value_sha256
        FROM (SELECT doc_id, source, length(text) AS lt,
                     length(doc_id::VARCHAR) AS li,
                     length(source) AS ls
              FROM documents)"""
    for c, (v, s, e) in _PII_SPANS.items()
)

# q_simhash oracle: recompute the md5_16 simhash bit-exactly in DuckDB
# (unnest words → nibble-parse md5 → 16 vote sums → assemble bits).
# Wordless docs get 65535 (all votes 0 → every bit set), matching the
# Spark fold over an empty array.
def _simhash_oracle() -> str:
    nib = [f"(instr({_HX}, substr(m, {i}, 1)) - 1)" for i in (1, 2, 3, 4)]
    hw = f"({nib[0]} * 4096 + {nib[1]} * 256 + {nib[2]} * 16 + {nib[3]})"
    votes = ", ".join(
        f"sum(CASE WHEN (hw >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(16)
    )
    bits = " + ".join(
        f"(CASE WHEN v{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    )
    return f"""
        WITH w AS (SELECT doc_id, unnest(list_filter(
                     string_split(text, ' '), x -> x != '')) AS word
                   FROM documents),
        h AS (SELECT doc_id, {hw} AS hw
              FROM (SELECT doc_id, md5(word) AS m FROM w)),
        v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
        SELECT d.doc_id,
               (CASE WHEN v.doc_id IS NULL THEN 65535 ELSE {bits} END)::BIGINT
                 AS simhash
        FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
    """


ORACLES["q_simhash"] = _simhash_oracle()

# q_replay_anonymized oracle: LWW fold → chained regexp_replace in the
# SAME category order the Spark Anonymizer applies (self.protected =
# request order) → sha256 of the redacted content.  Patterns come from
# the shared registry, so the two sides cannot drift.


def _replay_anonymized_oracle() -> str:
    red = "txt"
    for c in ["EMAIL", "URL", "DATE", "ZIP"]:
        red = (
            f"regexp_replace({red}, '{_sqlq(_PII[c])}', "
            f"'[REDACTED_{c}]', 'g')"
        )
    return f"""
        WITH win AS (
          SELECT source, doc_id,
                 {_ENRICH_SQL} AS txt
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY source ORDER BY doc_id DESC) rn
                FROM documents)
          WHERE rn = 1),
        red AS (SELECT source, doc_id AS winner_doc_id,
                       {red} AS content_redacted
                FROM win)
        SELECT source, winner_doc_id, content_redacted,
               sha256(content_redacted) AS content_sha256
        FROM red
    """


ORACLES["q_replay_anonymized"] = _replay_anonymized_oracle()

# q_ivf_ann oracle: recompute the IVF search end-to-end in DuckDB —
# centroids = 16 lowest-id vectors, cell = argmax of 6-dp-rounded
# cosine (ties → lowest cell id, matching the Spark fold and the
# python probe), probe the 4 best cells for the query (vec_id 0),
# then threshold on the 3-dp-rounded cosine.
ORACLES["q_ivf_ann"] = f"""
    WITH c AS (SELECT vec_id AS ci, embedding::DOUBLE[] AS ce
               FROM embeddings WHERE vec_id < 16),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    probe AS (SELECT ci FROM c, q
              ORDER BY {_COS_DD.format(a='ce', b='qe', r=6)} DESC, ci
              LIMIT 4),
    cells AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                (SELECT ci FROM c
                 ORDER BY {_COS_DD.format(a='c.ce', b='e.embedding::DOUBLE[]', r=6)}
                   DESC, ci
                 LIMIT 1) AS cell
              FROM embeddings e)
    SELECT vec_id, {_COS_DD.format(a='v', b='qe', r=3)} AS cos_sim
    FROM cells, q
    WHERE cell IN (SELECT ci FROM probe) AND vec_id != 0
      AND {_COS_DD.format(a='v', b='qe', r=3)} >= 0.2
"""

ORACLES["q_media_features"] = f"""
    WITH b AS (SELECT doc_id, sha256(text) AS sha,
                      octet_length(encode(text)) AS nb
               FROM documents)
    SELECT doc_id::BIGINT AS media_id, 'image' AS kind,
           nb::BIGINT AS n_bytes,
           (16 + {_hexbyte('sha', 1)} % 64)::INTEGER AS width,
           (16 + {_hexbyte('sha', 3)} % 64)::INTEGER AS height,
           sha AS checksum
    FROM b
"""
