"""Incremental materialized-aggregate maintenance from the change feed.

A downstream aggregate (counts, sums — any additive measure) over the
lakehouse table's LIVE state can be kept up to date by folding each
committed merge's emitted change feed instead of rescanning the base
table: an I adds the new row's contribution, a D retracts the old
row's, and a U does both (retract the ``_pre`` image, add the post
image — which also moves the row between groups when the grouping
value itself changed).  That makes refresh cost O(changed rows), not
O(table) — the property that matters when the base table is 100 TB and
an epoch touches 0.1% of it.

This is the classic incremental view-maintenance fold (self-maintainable
distributive aggregates over insert/delete/update deltas — Gupta &
Mumick's materialized-view taxonomy; the Delta Live Tables / Flink
retract-stream analog).  Retraction needs the full pre-image, so the
feed must be written by a sink constructed with ``cdf_preimage=True``
(Delta CDF's ``update_preimage`` analog).

Only DISTRIBUTIVE measures are supported (count, sum, and anything
linear in them — e.g. an average is maintained as sum+count and
finished at read time).  min/max are deliberately NOT expressible: a
retraction below the current max cannot be repaired from deltas alone
(it needs a per-group rescan), and pretending otherwise is how
incremental views silently rot.

Reference parity: the reference engine re-derives downstream state by
re-running the full export query per sync
(/root/reference/src/core/export/batch.rs); here the feed makes the
downstream refresh itself incremental.

Scale shape: one shuffle per refresh (groupBy on the group columns over
the pending feed rows) + one broadcast-or-shuffle join against the
(group-cardinality-sized) state — never a scan of the base table.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# a measure builds its per-row contribution from a column accessor
# (name -> Column) so the same expression evaluates against the post
# image (top-level columns) and the pre image (the `_pre` struct)
Measure = Callable[[Callable[[str], Column]], Column]


def count_live() -> Measure:
    """The liveness count — +1 per live row.  Every view should carry
    one: it is what lets the fold drop groups whose last row died."""
    return lambda col: F.lit(1)


def sum_of(expr: Measure) -> Measure:
    """Sum of an arbitrary row expression, e.g.
    ``sum_of(lambda c: F.length(c("content")))``."""
    return expr


def cdf_delta(changes: DataFrame, group_cols: list[str],
              measures: dict[str, Measure],
              preimage_col: str = "_pre",
              column_types: dict | None = None) -> DataFrame:
    """Per-group additive deltas of one (or a union of several) change
    feeds: post-image contributions (+) for I/U rows, pre-image
    contributions (−) for U/D rows.  Because pre and post are projected
    SEPARATELY, a U that moves a row between groups retracts from the
    old group and adds to the new one.

    Deltas are commutative (sums of signed contributions), so feeds
    from several epochs may be unioned and folded in any order — which
    is also why a streaming ``foreachBatch`` consumer needs no cross-
    batch ordering guarantee.

    ``column_types`` (name → Spark DataType) lets a measure reference
    a column this particular feed PRE-DATES (schema evolution: the
    column was added in a later epoch) — the contribution becomes a
    typed NULL, which ``sum`` skips, exactly matching the base table's
    all-null reading of pre-evolution rows.  Without the hint, an
    unknown column raises.
    """
    if preimage_col not in changes.columns:
        raise ValueError(
            f"change feed has no `{preimage_col}` pre-image column — "
            "construct the sink with cdf_preimage=True (U/D retraction "
            "needs the full old row)"
        )
    pre_fields = {
        f.name for f in changes.schema[preimage_col].dataType.fields
    }
    top = set(changes.columns)

    def _null(name: str) -> Column:
        if column_types and name in column_types:
            return F.lit(None).cast(column_types[name])
        raise ValueError(
            f"column `{name}` is not in this feed (schema evolution?) "
            "— pass column_types so it can contribute a typed NULL"
        )

    from ..sinks.lakehouse import KEY_COLS

    def post_col(name: str) -> Column:
        return F.col(name) if name in top else _null(name)

    def pre_col(name: str) -> Column:
        if name in pre_fields:
            return F.col(f"{preimage_col}.{name}")
        # ONLY key columns may fall through to the top level (they are
        # identical pre/post and never live in the struct).  A non-key
        # column missing from `_pre` means this feed's pre-state
        # pre-dates the column (e.g. a feed REGENERATED across an
        # evolution boundary reads the old snapshot with its old
        # schema) — its pre-image value is NULL, and falling back to
        # the POST value would silently retract the wrong amount.
        if name in KEY_COLS and name in top:
            return F.col(name)
        return _null(name)

    # ONE scan of the feed: each change row explodes into its signed
    # contributions (post-image + for I/U, negated pre-image − for
    # U/D) as struct array elements — a separate filter branch per
    # side would scan the feed files twice (verified in the captured
    # plan; docs/PLANS.md)
    post_struct = F.struct(
        *[post_col(g).alias(g) for g in group_cols],
        *[m(post_col).alias(k) for k, m in measures.items()],
    )
    pre_struct = F.struct(
        *[pre_col(g).alias(g) for g in group_cols],
        *[(-m(pre_col)).alias(k) for k, m in measures.items()],
    )
    contrib = F.array(
        F.when(F.col("_change").isin("I", "U"), post_struct),
        F.when(F.col("_change").isin("U", "D"), pre_struct),
    )
    return (
        changes.select(F.explode(contrib).alias("_c"))
        .filter(F.col("_c").isNotNull())
        .select("_c.*")
        .groupBy(*group_cols)
        .agg(*[F.sum(k).alias(k) for k in measures])
    )


def fold_delta(state: DataFrame | None, delta: DataFrame,
               group_cols: list[str], measure_cols: list[str],
               count_col: str | None = None) -> DataFrame:
    """Merge a per-group delta into the current aggregate state
    (full-outer on the group key; per-measure coalesced addition).
    Groups whose ``count_col`` reaches 0 — every live row retracted —
    are dropped, so the view's row set tracks the live key space."""
    if state is None:
        merged = delta
    else:
        s = state.select(
            *[F.col(g).alias(f"_s_{g}") for g in group_cols],
            *[F.col(c).alias(f"_s_{c}") for c in measure_cols],
        )
        # eqNullSafe per group column: a NULL group value is a real
        # group (e.g. a nullable lang) — a null-unsafe join would
        # never merge it and the view would accumulate phantom
        # (NULL, +x)/(NULL, -x) row pairs forever
        cond = None
        for g in group_cols:
            c = F.col(f"_s_{g}").eqNullSafe(F.col(g))
            cond = c if cond is None else (cond & c)
        merged = s.join(delta, cond, "full_outer").select(
            *[F.coalesce(F.col(g), F.col(f"_s_{g}")).alias(g)
              for g in group_cols],
            *[
                (F.coalesce(F.col(f"_s_{c}"), F.lit(0))
                 + F.coalesce(F.col(c), F.lit(0))).alias(c)
                for c in measure_cols
            ],
        )
    if count_col is not None:
        merged = merged.filter(F.col(count_col) != 0)
    return merged


class IncrementalAggView:
    """A parquet-backed materialized aggregate over a LakehouseSink's
    live state, maintained purely from the change feed.

    State layout under ``path``: versioned ``state_v<K>`` parquet dirs
    plus a ``_VIEW`` JSON pointer ``{"version": K,
    "applied_through_epoch": E}`` written atomically (tmp + rename) —
    a crash mid-refresh leaves the previous version intact and the
    next refresh re-folds the same epochs (feeds are immutable, deltas
    are deterministic, so the re-fold is idempotent).

    ``refresh(sink)`` folds every committed merge epoch newer than the
    watermark in ONE delta pass (union of the pending feeds);
    ``stream_refresh(sink, checkpoint)`` does the same continuously
    through ``sink.changes_stream()`` + ``foreachBatch`` — there the
    exactly-once bookkeeping is the stream checkpoint's, so the
    ``_VIEW`` epoch watermark is not advanced (pick one driver per
    view instance, don't mix them)."""

    def __init__(self, spark: SparkSession, path: str,
                 group_cols: list[str], measures: dict[str, Measure],
                 count_col: str = "n_rows"):
        if count_col not in measures:
            measures = {count_col: count_live(), **measures}
        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.measures = measures
        self.count_col = count_col
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ state
    def _pointer(self) -> dict:
        p = os.path.join(self.path, "_VIEW")
        if not os.path.exists(p):
            return {"version": 0, "applied_through_epoch": -1}
        with open(p) as f:
            return json.load(f)

    def _write_pointer(self, ptr: dict) -> None:
        tmp = os.path.join(self.path, "_VIEW.tmp")
        with open(tmp, "w") as f:
            json.dump(ptr, f)
        os.replace(tmp, os.path.join(self.path, "_VIEW"))

    def state(self) -> DataFrame | None:
        ptr = self._pointer()
        if ptr["version"] == 0:
            return None
        return self.spark.read.parquet(
            os.path.join(self.path, f"state_v{ptr['version']}")
        )

    def _advance(self, merged: DataFrame, prev_version: int,
                 applied_through: int | None) -> None:
        nxt = prev_version + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, f"state_v{nxt}")
        )
        ptr = self._pointer()
        ptr["version"] = nxt
        if applied_through is not None:
            ptr["applied_through_epoch"] = applied_through
        self._write_pointer(ptr)
        self._gc_state_dirs(nxt)

    # ---------------------------------------------------------- refresh
    def refresh(self, sink) -> dict:
        """Fold every committed merge epoch the view hasn't seen.
        Returns ``{"applied_epochs": [...], "version": K}``.

        Per-epoch feeds become per-epoch deltas (their schemas may
        differ across a schema-evolution boundary — a column a measure
        reads may not exist in older feeds, so each epoch's delta is
        built with typed-NULL fallbacks from the NEWEST feed's types),
        and the DELTAS — identically-shaped by construction — are
        unioned and re-summed into one combined delta: still a single
        fold join for the whole catch-up, however many epochs behind."""
        ptr = self._pointer()
        if ptr.get("stream_ckpt") is not None:
            # the stream driver tracks progress in ITS checkpoint, not
            # the epoch watermark — a batch refresh here would re-fold
            # everything the stream already applied
            raise RuntimeError(
                "view is stream-maintained (checkpoint "
                f"{ptr['stream_ckpt']}); use stream_refresh, or "
                "rebuild the view for batch driving"
            )
        pending = [
            ep for ep in self._merge_epochs(sink)
            if ep > ptr["applied_through_epoch"]
        ]
        if not pending:
            return {"applied_epochs": [], "version": ptr["version"]}
        # merge epochs are dense (the replay runner numbers them
        # sequentially), so a pending list that does NOT start right
        # after the watermark means vacuum(retain_versions) pruned
        # manifests of epochs this view never folded — without this
        # check the view would fold only the surviving feeds and be
        # SILENTLY WRONG
        if pending[0] > ptr["applied_through_epoch"] + 1:
            raise RuntimeError(
                "view is behind the table's vacuumed manifest "
                f"retention (folded through epoch "
                f"{ptr['applied_through_epoch']}, earliest visible "
                f"merge is epoch {pending[0]}): call bootstrap(sink) "
                "to re-base from the live state, then refresh() "
                "incrementally"
            )
        try:
            feeds = [sink.changes(ep) for ep in pending]
        except FileNotFoundError as e:
            # the feed dir was vacuum-pruned AND the manifests needed
            # to regenerate it are gone — incremental catch-up is
            # impossible by design; the view must re-base
            raise RuntimeError(
                "view is behind the table's vacuumed feed/manifest "
                f"retention (pending epochs {pending}): call "
                "bootstrap(sink) to re-base from the live state, then "
                "refresh() incrementally"
            ) from e
        types = self._column_types(feeds[-1])
        deltas = [
            cdf_delta(f, self.group_cols, self.measures,
                      column_types=types)
            for f in feeds
        ]
        delta = deltas[0]
        for d in deltas[1:]:
            delta = delta.unionByName(d)
        if len(deltas) > 1:
            delta = delta.groupBy(*self.group_cols).agg(
                *[F.sum(k).alias(k) for k in self.measures]
            )
        merged = fold_delta(self.state(), delta, self.group_cols,
                            list(self.measures), self.count_col)
        # detach from the state files the write below will replace
        merged = merged.localCheckpoint()
        self._advance(merged, ptr["version"], pending[-1])
        return {"applied_epochs": pending,
                "version": ptr["version"] + 1}

    @staticmethod
    def _column_types(feed: DataFrame) -> dict:
        types = {f.name: f.dataType for f in feed.schema.fields
                 if f.name != "_pre"}
        if "_pre" in feed.columns:
            for f in feed.schema["_pre"].dataType.fields:
                types.setdefault(f.name, f.dataType)
        return types

    def bootstrap(self, sink) -> dict:
        """Initialize (or re-base) the view with ONE direct aggregate
        over the base table's live state, then go incremental from
        there.  This is how a view starts on a table whose early feeds
        AND the manifests needed to regenerate them have been
        vacuum-pruned — folding from epoch 0 is impossible there by
        design, and O(table)-once is the honest cost of joining late.
        Pinned to the head version at entry, so a merge racing the
        bootstrap lands in the next ``refresh``, not in a torn
        snapshot."""
        head = sink.manifest()["version"]
        applied_through = -1
        for v in sink._committed_versions():
            if v == 0 or v > head:
                continue
            mv = sink.manifest(v)
            ep = mv.get("epoch_id", -1)
            if ep is not None and ep >= 0 and not mv.get("compaction"):
                applied_through = max(applied_through, ep)
        live = sink.read(version=head)

        def post_col(name: str) -> Column:
            return F.col(name)

        state = live.groupBy(*self.group_cols).agg(
            *[F.sum(m(post_col)).alias(k)
              for k, m in self.measures.items()]
        )
        if self.count_col is not None:
            state = state.filter(F.col(self.count_col) != 0)
        state = state.localCheckpoint()
        ptr = self._pointer()
        nxt = ptr["version"] + 1
        state.write.mode("overwrite").parquet(
            os.path.join(self.path, f"state_v{nxt}")
        )
        self._write_pointer({"version": nxt,
                             "applied_through_epoch": applied_through})
        self._gc_state_dirs(nxt)
        return {"version": nxt, "applied_through_epoch": applied_through}

    @staticmethod
    def _merge_epochs(sink) -> list[int]:
        return sink.merge_epochs()

    def _gc_state_dirs(self, keep_version: int) -> None:
        """Drop every non-current state dir — including orphans a
        crash left between a pointer write and its cleanup."""
        import glob as _glob
        keep = f"state_v{keep_version}"
        for d in _glob.glob(os.path.join(self.path, "state_v*")):
            if os.path.basename(d) != keep:
                shutil.rmtree(d, ignore_errors=True)

    # ---------------------------------------------------- streaming
    def stream_refresh(self, sink, checkpoint: str, **trigger):
        """Maintain the view continuously from the change-feed stream.
        Each micro-batch folds exactly like ``refresh`` (deltas are
        commutative, so batch boundaries and file order don't matter);
        restart recovery is the stream checkpoint's.  Defaults to
        ``availableNow`` (drain-and-stop); pass e.g.
        ``processingTime="10 seconds"`` for a long-lived view."""
        if not trigger:
            trigger = {"availableNow": True}
        # normalize: the redelivery guard compares checkpoints, and a
        # restart that spells the same dir differently ("ckpt" vs
        # "./ckpt") must still be recognized as the same stream
        ckpt = os.path.abspath(checkpoint)
        # a NEW checkpoint lists the whole feed again — folding it onto
        # state the old driver already built would double every count
        # and sum.  Refuse loudly unless the view is empty (fresh) or
        # the checkpoint matches the one that built it.
        ptr = self._pointer()
        prev = ptr.get("stream_ckpt")
        if ptr["version"] > 0 and prev != ckpt:
            raise RuntimeError(
                "view state was built by "
                + (f"stream checkpoint {prev}" if prev
                   else "batch refresh()/bootstrap()")
                + f"; starting a stream on checkpoint {ckpt} would "
                "re-fold already-applied feeds. Reuse the original "
                "checkpoint, or rebuild the view under one driver."
            )
        return (
            sink.changes_stream()
            .writeStream.foreachBatch(
                lambda batch, bid:
                self._apply_stream_batch(batch, bid, ckpt)
            )
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    def _apply_stream_batch(self, batch: DataFrame, bid: int,
                            checkpoint: str) -> None:
        """One micro-batch fold.  foreachBatch is AT-LEAST-once: a
        crash after the fold but before the stream checkpoint commits
        re-delivers the same batchId on restart — re-folding it would
        double-apply the delta.  The view pointer records
        (checkpoint, batchId) of the last applied fold, and the pointer
        write (one atomic rename) adopts the new state AND the batch id
        together, so the fold is idempotent per redelivered batch."""
        checkpoint = os.path.abspath(checkpoint)
        ptr = self._pointer()
        if (ptr.get("stream_ckpt") == checkpoint
                and bid <= ptr.get("stream_batch_id", -1)):
            return
        if not batch.isEmpty():
            delta = cdf_delta(batch, self.group_cols, self.measures)
            merged = fold_delta(
                self.state(), delta, self.group_cols,
                list(self.measures), self.count_col,
            ).localCheckpoint()
            nxt = ptr["version"] + 1
            merged.write.mode("overwrite").parquet(
                os.path.join(self.path, f"state_v{nxt}")
            )
            ptr["version"] = nxt
        ptr["stream_ckpt"] = checkpoint
        ptr["stream_batch_id"] = bid
        self._write_pointer(ptr)
        self._gc_state_dirs(ptr["version"])
