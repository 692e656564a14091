"""CLI: replay / status / validate-config / init / compact.

Reference analog: atlas's clap subcommands (``/root/reference/src/cli/
commands/export.rs``, ``status.rs``, ``validate.rs``, ``init.rs``) with
the same exit-code contract: 0 ok, 1 partial/failed, 2 config error,
130 interrupted (SIGINT), 143 (SIGTERM).

Run as ``python -m atlas_spark.cli <cmd>`` locally or ship the package
with ``spark-submit --py-files atlas_spark.zip run.py`` on a cluster —
the entry points only need a SparkSession.
"""

from __future__ import annotations

import argparse
import signal
import sys

from .config import SAMPLE_TOML, load_config


def _build(cfg):
    from .session import get_spark
    from .sinks import LakehouseSink
    from .streaming import ControlTables, ReplayRunner

    spark = get_spark(
        cfg.spark.app_name,
        master=cfg.spark.master,
        shuffle_partitions=cfg.spark.shuffle_partitions,
    )
    if cfg.sink.format == "iceberg":
        from .sinks.iceberg import IcebergSink

        sink = IcebergSink(spark, cfg.sink.table_root,
                           n_buckets=cfg.sink.n_buckets)
    else:
        sink = LakehouseSink(spark, cfg.sink.table_root,
                             n_buckets=cfg.sink.n_buckets,
                             mode=cfg.sink.merge_mode,
                             emit_changes=cfg.sink.emit_changes,
                             cdf_preimage=cfg.sink.cdf_preimage)
    decl = cfg.sink.declared_pairs() if hasattr(cfg.sink, "declared_pairs") else []
    if decl and hasattr(sink, "supports_deferred_decode"):
        sink.ensure(declared_columns=decl)
    else:
        sink.ensure()
    control = ControlTables(cfg.sink.table_root)
    transform = None
    if cfg.run.anonymize:
        from .anonymize import Anonymizer

        anon = Anonymizer(mode=cfg.run.anonymize_mode,
                          strategy=cfg.run.anonymize_strategy)
        transform = lambda df: anon.anonymize(df, "content")  # noqa: E731
    runner = ReplayRunner(
        spark,
        sink,
        control,
        files_per_epoch=cfg.source.files_per_epoch,
        dry_run=cfg.run.dry_run,
        quarantine=cfg.run.quarantine,
        rejects_dir=f"{cfg.sink.table_root}/_control/rejects",
        compact_every=cfg.run.compact_every,
        compact_max_file_versions=cfg.run.compact_max_file_versions,
        transform=transform,
    )
    return spark, sink, control, runner


def cmd_replay(args) -> int:
    cfg = load_config(args.config)
    errs = cfg.validate()
    if errs:
        for e in errs:
            print(f"config error: {e}", file=sys.stderr)
        return 2

    stop = {"flag": False, "code": 130}

    def _handler(signum, frame):
        stop["flag"] = True
        stop["code"] = 130 if signum == signal.SIGINT else 143
        print("shutdown requested — finishing current epoch", file=sys.stderr)

    signal.signal(signal.SIGINT, _handler)
    signal.signal(signal.SIGTERM, _handler)

    spark, sink, control, runner = _build(cfg)
    # stream-identity confirm (reference export.rs:147-172 prompts
    # before every export; we prompt only when it matters): replaying a
    # DIFFERENT changelog into a committed table means epoch ordinals
    # collide with existing fences — data would be silently skipped or
    # the plan guard would abort mid-run.  Demand --yes (or an
    # interactive confirmation) and re-record the identity.
    recorded = runner.recorded_fingerprint()
    planned = runner.changelog_fingerprint(cfg.source.changelog_dir)
    if recorded is not None and planned is not None and recorded != planned:
        ok = bool(getattr(args, "yes", False))
        if not ok and sys.stdin.isatty():
            ans = input(
                "changelog fingerprint differs from the one this table "
                "was built from — continue anyway? [y/N] "
            )
            ok = ans.strip().lower() in ("y", "yes")
        if not ok:
            print(
                "refusing: this table was built from a different "
                "changelog (fingerprint mismatch — directory rotated, "
                "renamed or re-sliced?).  Point at the original "
                "changelog, use a fresh sink.table_root, or re-run "
                "with --yes to accept the new stream identity.",
                file=sys.stderr,
            )
            spark.stop()
            return 2
        # Do NOT record the new identity here (ADVICE r03): if the
        # epoch-plan guard or the full-mode refusal below aborts the
        # run, a recorded-but-unapplied identity makes a retry against
        # the ORIGINAL changelog spuriously mismatch.  run() records it
        # after the epoch-plan guard passes.
        runner.accept_new_fingerprint = True
    if cfg.source.mode == "full" and sink.last_committed_epoch() >= 0:
        # full replay = from-scratch rebuild; refusing to silently wipe
        # or double-apply an existing table (coordinator.rs:454-458
        # analog, but explicit where the reference trusts the operator)
        print(
            "config error: source.mode=full but the table already has "
            "committed epochs — point full replay at a fresh "
            "sink.table_root (or use incremental mode to resume)",
            file=sys.stderr,
        )
        spark.stop()
        return 2
    s = runner.run(cfg.source.changelog_dir,
                   should_stop=lambda: stop["flag"])
    print(
        f"epochs applied={s.epochs_applied} skipped={s.epochs_skipped} "
        f"rows={s.rows_in} deletes={s.deletes} rejects={s.rejects} "
        f"rate={s.events_per_sec:.0f} ev/s"
        + (" [interrupted]" if s.interrupted else "")
    )
    spark.stop()
    if s.interrupted:
        return stop["code"]
    return 0


def cmd_status(args) -> int:
    cfg = load_config(args.config)
    if not cfg.sink.table_root:
        print("config error: sink.table_root required", file=sys.stderr)
        return 2
    as_json = bool(getattr(args, "json", False))
    spark, sink, control, _ = _build(cfg)
    m = sink.manifest() if hasattr(sink, "manifest") else {}
    summary = {
        "table": cfg.sink.table_root,
        "version": m.get("version"),
        "last_epoch": m.get("committed_epoch_max"),
        "buckets": m.get("n_buckets"),
        "schema": [n for n, _ in (tuple(x) for x in m.get("schema", []))],
    }
    if not as_json:
        print(f"table: {summary['table']}")
        print(
            f"version={summary['version']} last_epoch={summary['last_epoch']} "
            f"buckets={summary['buckets']} schema={summary['schema']}"
        )
    # status glyph column + filters (reference `status` parity,
    # src/cli/commands/status.rs:93-127: per-watermark glyphs and
    # --template-id/--ehr-id filters).  Watermarks here are keyed by
    # (epoch, bucket) — bucketing is on hash(repo, path), so the
    # filter analogs are --epoch / --bucket, not a repo name.
    # ControlTables writes in_progress/completed/interrupted/recovered
    # (state.py:84,100,157,174) — match those, not "started"
    # (ADVICE r05 #2).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    glyph = (
        F.when(F.col("status") == "completed", F.lit("✅ completed"))
        .when(F.col("status") == "in_progress", F.lit("🔄 in progress"))
        .when(F.col("status") == "interrupted", F.lit("❌ interrupted"))
        .when(F.col("status") == "recovered", F.lit("♻️  recovered"))
        .otherwise(F.concat(F.lit("⏸️  "), F.col("status")))
    )
    try:
        wm = control.watermarks_df(spark)
        # Per-bucket watermark LAG (status.rs:93-127 prints lag-style
        # detail per watermark): each bucket's newest max_seq_applied vs
        # the most-advanced bucket's — "how far behind the frontier is
        # this bucket".  O(buckets) rows; aggregate-sized.
        latest = (
            wm.filter(F.col("partition_id") >= 0)
            .groupBy("partition_id")
            .agg(F.max("max_seq_applied").alias("max_seq_applied"))
        )
        lag = latest.withColumn(
            "seq_lag",
            F.max("max_seq_applied").over(Window.partitionBy())
            - F.col("max_seq_applied"),
        )
        wm = wm.withColumn("status_glyph", glyph)
        if getattr(args, "epoch", None) is not None:
            wm = wm.filter(F.col("epoch_id") == args.epoch)
        if getattr(args, "bucket", None) is not None:
            wm = wm.filter(F.col("partition_id") == args.bucket)
            lag = lag.filter(F.col("partition_id") == args.bucket)
        mdf = control.metrics_df(spark).withColumn("status_glyph", glyph)
        if getattr(args, "epoch", None) is not None:
            mdf = mdf.filter(F.col("epoch_id") == args.epoch)
        wm = wm.orderBy("epoch_id", "partition_id")
        lag = lag.orderBy("partition_id")
        mdf = mdf.orderBy("epoch_id")
        if as_json:
            import json as _json

            def rows(df):
                return [r.asDict() for r in df.drop("status_glyph").collect()]

            doc = dict(
                summary,
                watermarks=rows(wm),
                bucket_lag=rows(lag),
                metrics=rows(mdf),
            )
            print(_json.dumps(doc, default=str))
        else:
            wm.drop("status").withColumnRenamed(
                "status_glyph", "status").show(50, truncate=False)
            lag.show(50, truncate=False)
            mdf.drop("status").withColumnRenamed(
                "status_glyph", "status").show(50, truncate=False)
    except Exception as e:  # noqa: BLE001 — empty control tables
        if as_json:
            import json as _json

            print(_json.dumps(dict(summary, watermarks=[], bucket_lag=[],
                                   metrics=[], note="no control tables yet")))
        else:
            print(f"no control tables yet ({type(e).__name__})")
    spark.stop()
    return 0


def cmd_validate(args) -> int:
    try:
        cfg = load_config(args.config)
    except Exception as e:  # noqa: BLE001
        print(f"config error: {e}", file=sys.stderr)
        return 2
    errs = cfg.validate()
    if errs:
        for e in errs:
            print(f"config error: {e}", file=sys.stderr)
        return 2
    print("config OK")
    return 0


def cmd_init(args) -> int:
    with open(args.output, "w") as f:
        f.write(SAMPLE_TOML)
    print(f"wrote {args.output}")
    return 0


def cmd_verify(args) -> int:
    """Post-export verification (O7 analog, but checksum-strict):
    compare the live table against an expected parquet snapshot
    carrying (repo, path, content_sha256)."""
    cfg = load_config(args.config)
    spark, sink, _, _ = _build(cfg)
    from .verification import verify_state

    expected = spark.read.parquet(args.expected)
    report = verify_state(sink.read(), expected, with_detail=True)
    print(
        f"expected={report.expected_rows} actual={report.actual_rows} "
        f"missing={report.missing} unexpected={report.unexpected} "
        f"hash_mismatch={report.hash_mismatch} "
        f"success_rate={report.success_rate:.4f} "
        f"{'PASS' if report.passed else 'FAIL'}"
    )
    # per-key failure detail (report.rs:11-108 analog): name the keys,
    # not just the counts — capped sample, O(n) driver cost
    for f in report.sample_failures(args.show_failures):
        print(
            f"  {f['reason']:<13} {f['repo']}/{f['path']} "
            f"actual={f['actual_sha256'] or '-'} "
            f"expected={f['expected_sha256'] or '-'}"
        )
    spark.stop()
    return 0 if report.passed else 1


def cmd_compact(args) -> int:
    drop = bool(getattr(args, "drop_tombstones", False))
    if drop and not getattr(args, "yes", False):
        # destructive-path confirm (reference export.rs:147-172 analog):
        # dropping tombstones mid-stream lets a late smaller-seq upsert
        # resurrect a deleted key — demand an explicit --yes
        print(
            "refusing: --drop-tombstones permanently removes delete "
            "markers; safe ONLY after the changelog is fully consumed. "
            "Re-run with --yes to confirm.",
        )
        return 2
    cfg = load_config(args.config)
    spark, sink, _, _ = _build(cfg)
    mfv = getattr(args, "max_file_versions", None)
    if mfv is not None and drop:
        print("config error: --max-file-versions (selective) cannot be "
              "combined with --drop-tombstones (needs a full pass)",
              file=sys.stderr)
        spark.stop()
        return 2
    res = sink.compact(drop_tombstones=drop, max_file_versions=mfv)
    print(f"compacted: {res}")
    spark.stop()
    return 0


def cmd_replicate(args) -> int:
    """Sync a replica table from the configured source table's change
    feed (CDC fan-out).  Requires the source to have been replayed
    with ``sink.emit_changes = true``."""
    import json as _json

    from .operators.replicate import replicate, replication_lag
    from .sinks import LakehouseSink

    cfg = load_config(args.config)
    if not cfg.sink.emit_changes:
        print("config error: replicate requires sink.emit_changes = "
              "true on the source table (the feed IS the transport)",
              file=sys.stderr)
        return 2
    spark, src, _, _ = _build(cfg)
    dst = LakehouseSink(spark, args.to, n_buckets=cfg.sink.n_buckets,
                        emit_changes=True)
    dst.ensure()
    try:
        out = replicate(src, dst)
    except RuntimeError as e:
        print(f"replicate refused: {e}", file=sys.stderr)
        spark.stop()
        return 1
    lag = replication_lag(src, dst)
    print(_json.dumps({"applied_epochs": out["applied_epochs"], **lag}))
    spark.stop()
    return 0


def cmd_vacuum(args) -> int:
    retain = getattr(args, "retain_versions", None)
    retain_changes = getattr(args, "retain_changes", None)
    if (retain is not None or retain_changes is not None) \
            and not getattr(args, "yes", False):
        # pruning manifests permanently gives up time travel / diff()
        # to the pruned versions (and pruned change-feed epochs can
        # only be regenerated while their manifests survive) — demand
        # an explicit --yes
        print(
            "refusing: --retain-versions/--retain-changes permanently "
            "remove older snapshots or feed epochs (time travel, diff "
            "and change-feed reads to them stop working; late views "
            "must bootstrap()). Re-run with --yes to confirm.",
        )
        return 2
    cfg = load_config(args.config)
    spark, sink, _, _ = _build(cfg)
    res = sink.vacuum(
        retain_versions=retain,
        min_age_seconds=args.min_age_seconds,
        retain_changes=retain_changes,
    )
    print(f"vacuumed: {res}")
    spark.stop()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="atlas_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [
        ("replay", cmd_replay),
        ("status", cmd_status),
        ("validate-config", cmd_validate),
        ("compact", cmd_compact),
        ("vacuum", cmd_vacuum),
        ("replicate", cmd_replicate),
    ]:
        sp = sub.add_parser(name)
        sp.add_argument("-c", "--config", required=(name != "init"))
        if name == "replicate":
            sp.add_argument("--to", required=True,
                            help="replica table root to sync from the "
                                 "source's change feed")
        if name == "replay":
            sp.add_argument("--yes", action="store_true",
                            help="accept a changed changelog stream "
                                 "identity without prompting")
        if name == "compact":
            sp.add_argument("--drop-tombstones", action="store_true",
                            help="physically remove delete markers "
                                 "(end-of-replay ONLY; requires --yes)")
            sp.add_argument("--yes", action="store_true",
                            help="confirm the destructive path")
            sp.add_argument("--max-file-versions", type=int, default=None,
                            help="selective: fold only buckets holding "
                                 "more than this many files")
        if name == "status":
            sp.add_argument("--epoch", type=int, default=None,
                            help="show only this epoch's watermarks/metrics")
            sp.add_argument("--bucket", type=int, default=None,
                            help="show only this bucket's watermarks")
            sp.add_argument("--json", action="store_true",
                            help="emit one machine-readable JSON doc "
                                 "(summary + watermarks + bucket_lag + "
                                 "metrics) instead of tables")
        if name == "vacuum":
            sp.add_argument("--retain-versions", type=int, default=None,
                            help="prune manifests older than the newest "
                                 "N versions (requires --yes)")
            sp.add_argument("--retain-changes", type=int, default=None,
                            help="keep only the newest N change-feed "
                                 "epoch dirs (requires --yes)")
            sp.add_argument("--min-age-seconds", type=float, default=3600.0,
                            help="never delete files younger than this "
                                 "(in-flight commit guard)")
            sp.add_argument("--yes", action="store_true",
                            help="confirm giving up pruned snapshots")
        sp.set_defaults(fn=fn)
    sp = sub.add_parser("init")
    sp.add_argument("-o", "--output", default="atlas_spark.toml")
    sp.set_defaults(fn=cmd_init)
    sp = sub.add_parser("verify")
    sp.add_argument("-c", "--config", required=True)
    sp.add_argument("-e", "--expected", required=True,
                    help="parquet with (repo, path, content_sha256)")
    sp.add_argument("-n", "--show-failures", type=int, default=20,
                    help="max failing keys to print with reasons")
    sp.set_defaults(fn=cmd_verify)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
