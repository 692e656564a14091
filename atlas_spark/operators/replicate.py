"""CDC fan-out: keep a replica table in sync from the change feed.

The emitted feed (``emit_changes=True``) carries, per committed merge,
everything needed to re-apply that merge somewhere else: post-image
rows for I/U and the tombstone identity (key + seq) for D.  Replaying
those rows as an ordinary changelog batch into a second LakehouseSink —
same epoch ids, so the destination's own manifest fencing makes the
sync idempotent and resumable — reconstructs the source table
row-for-row WITHOUT ever scanning the source's data files.  This is
the downstream half of classic CDC replication (Debezium topic →
secondary store), and it doubles as the strongest completeness check
on the feed itself: if the feed dropped or misclassified anything, the
replica's state or its own re-emitted feed would diverge.

Cost shape at scale: per epoch, one scan of that epoch's feed files +
one ordinary merge into the replica — O(changed rows), never O(table).
Replication lag is visible as the difference between source and
replica merge-epoch watermarks (``pending`` in :func:`replicate`).

Reference analog: the reference's export loop re-reads every matching
source composition per sync (/root/reference/src/core/export/batch.rs);
here the feed IS the transport.

Contract boundary (found by the property suite): a D for a key that
was NEVER live leaves the live state unchanged, so — exactly like
Delta CDF for a no-op DELETE — no feed row is emitted and the replica
does not receive that tombstone.  Feed-driven syncs still converge
forever (a late-but-older upsert of that key changes nothing on the
source, hence emits nothing, hence changes nothing on the replica);
what is NOT supported is writing directly to a replica out-of-band and
expecting source-local never-live tombstones to guard it.  Replicas
are feed-maintained or they are not replicas.

Likewise (same root: change is defined by content, and the oracle-
gated classifier skips byte-identical re-upserts), a re-upsert of
identical bytes at a higher seq advances ``seq`` on the source but
emits nothing, so the replica's ``seq`` for that key can lag.  Content
still converges forever through the feed: any later event either
no-ops on the source too (and emits nothing) or wins there (and emits
with its own seq, which the replica then adopts).

An OCC-rebase CoW clobber emits a D whose key is ABSENT from the new
source state (post image all NULL, seq included); the projection
coalesces the delete onto the pre-image seq so it wins the replica's
LWW election, leaving the replica a TOMBSTONE where the source has no
row at all — live states equal, and the extra tombstone additionally
guards the replica against resurrections.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# the changelog surface a merge consumes; evolved payload columns ride
# along dynamically (mixed-schema batches union on the replica side
# exactly as on the source)
_BASE_COLS = ("seq", "op", "repo", "path", "commit", "lang", "content")


def feed_to_changelog(changes):
    """Project one epoch's change feed back into changelog-batch shape:
    I/U rows become op="U" upserts of the post image, D rows become
    op="D" tombstone writes at the tombstone's seq (deletes keep their
    seq in this engine, so late-but-older upserts stay dead on the
    replica too).  Pre-image/bookkeeping columns are dropped."""
    skip = {"_change", "_pre", "_pre_content_sha256", "_pre_seq",
            "is_deleted", "content_sha256", "epoch"}
    extra = [c for c in changes.columns
             if c not in skip and c not in _BASE_COLS]
    # a D whose key is ABSENT from the new state (an OCC-rebase CoW
    # clobber) has an all-NULL post image, including seq — a NULL-seq
    # delete would LOSE the replica's LWW election and the replica
    # would keep a row the source dropped.  The pre-image seq is the
    # seq the replica currently holds for that key (it mirrors the
    # source pre-state), and the cross-batch guard admits deletes at
    # seq equality, so coalescing onto `_pre_seq` applies the clobber.
    seq = (F.coalesce(F.col("seq"), F.col("_pre_seq")).alias("seq")
           if "_pre_seq" in changes.columns else F.col("seq"))
    return changes.select(
        seq,
        F.when(F.col("_change") == "D", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        "repo", "path", "commit", "lang", "content",
        *extra,
    )


def replicate(src, dst) -> dict:
    """Apply every source merge epoch the replica hasn't committed,
    oldest first, each as an ordinary epoch-fenced merge.  Idempotent
    (re-delivered epochs fence to no-ops on the replica's own
    manifest) and crash-resumable (a killed sync resumes at the first
    unfenced epoch).  Raises with bootstrap-style guidance if the
    source's retention has already pruned feeds the replica never saw
    — a silently incomplete replica is not an option."""
    src_eps = src.merge_epochs()
    # the replica's watermark is its HEAD manifest's epoch id — NOT
    # the set of surviving replica manifests: pruning the replica's
    # own old manifests (dst.vacuum(retain_versions)) must not make a
    # current replica look behind forever (review r07).  The head
    # manifest always survives retention, and compaction versions
    # inherit the last merge's epoch.
    head_ep = dst.manifest().get("epoch_id", -1)
    if head_ep is None:
        head_ep = -1
    pending = [ep for ep in src_eps if ep > head_ep]
    # merge epochs are dense, so the pending list must be exactly the
    # next consecutive run after the replica's watermark — anything
    # else means vacuum(retain_versions) pruned source manifests of
    # epochs the replica never saw, and applying only the survivors
    # would build a SILENTLY incomplete replica
    expected = head_ep + 1
    if pending != list(range(expected, expected + len(pending))):
        raise RuntimeError(
            "replica is behind the source's vacuumed feed/manifest "
            f"retention (replica watermark {head_ep}, visible "
            f"source epochs {pending}): re-seed the replica from a "
            "full source read instead"
        )
    applied = []
    for ep in pending:
        try:
            feed = src.changes(ep)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"replica is behind the source's vacuumed feed/manifest "
                f"retention (epoch {ep} unrecoverable): re-seed the "
                "replica from a full source read instead"
            ) from e
        dst.merge(feed_to_changelog(feed), ep)
        applied.append(ep)
    return {"applied_epochs": applied,
            "replica_head_epoch": max(src_eps) if src_eps else -1}


def replication_lag(src, dst) -> dict:
    """How far the replica trails the source, in epochs — the number a
    monitor alerts on.  Cheap: two manifest reads + one manifest-log
    listing, no data scanned."""
    src_eps = src.merge_epochs()
    head_ep = dst.manifest().get("epoch_id", -1)
    if head_ep is None:
        head_ep = -1
    pending = [ep for ep in src_eps if ep > head_ep]
    return {
        "source_head_epoch": max(src_eps) if src_eps else -1,
        "replica_head_epoch": head_ep,
        "pending_epochs": len(pending),
    }


def replicate_stream(src, dst, checkpoint: str, **trigger):
    """Continuous replication: each new feed epoch landing in
    ``_changes/`` triggers a sync.  The micro-batch content is used
    only as a SIGNAL — the sync itself re-reads complete feeds through
    :func:`replicate`, because a file-source batch may carry a PARTIAL
    epoch (``maxFilesPerTrigger``, races with the emit), and merging a
    partial epoch would fence out the remainder forever.  Redelivered
    signals are harmless: every epoch merge is fenced by the replica's
    own manifest.  Defaults to ``availableNow`` (drain-and-stop); pass
    ``processingTime="10 seconds"`` for a long-lived follower."""
    if not trigger:
        trigger = {"availableNow": True}
    return (
        src.changes_stream()
        .writeStream.foreachBatch(lambda _b, _bid: replicate(src, dst))
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
