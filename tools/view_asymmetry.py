"""Measure the incremental-view asymmetry: refresh-from-feed vs
recompute-from-table, at a big-table/small-epoch shape.

    python tools/view_asymmetry.py [n_keys] [n_changes]

Builds a table of ``n_keys`` live rows (one bulk merge, feed on,
pre-image on), bootstraps a per-repo aggregate view, then merges a
small epoch touching ``n_changes`` keys and times, best-of-3 each:

* ``refresh``  — the view folding ONLY the new epoch's feed
  (O(changed rows): one feed scan + delta agg + state fold + state
  write), and
* ``recompute`` — the same aggregate computed directly over the live
  table INCLUDING rewriting the view state parquet (what a
  non-incremental downstream job pays every sync).

The ratio grows with table_size/epoch_size — the structural claim in
operators/incremental.py; this records the measured shape, like
BENCH/MOR.md does for merge-on-read.  Appends one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from atlas_spark.operators.incremental import IncrementalAggView
from atlas_spark.session import get_spark
from atlas_spark.sinks import LakehouseSink

MEASURES = {"total_chars": lambda c: F.length(c("content"))}


def _batch(spark, n, seq0, n_keys):
    return (
        spark.range(n)
        .select(
            (F.col("id") + seq0).alias("seq"),
            F.lit("U").alias("op"),
            F.concat(F.lit("r"), F.pmod(F.col("id"), F.lit(64))
                     .cast("string")).alias("repo"),
            F.concat(F.lit("p"), F.pmod(F.col("id") * 2654435761,
                                        F.lit(n_keys)).cast("string"))
            .alias("path"),
            F.concat(F.lit("c"), (F.col("id") + seq0).cast("string"))
            .alias("commit"),
            F.lit("py").alias("lang"),
            F.concat(F.lit("content-"), (F.col("id") + seq0)
                     .cast("string"),
                     F.repeat(F.lit("x"), (F.pmod(F.col("id"), F.lit(64))
                                           + 16).cast("int")))
            .alias("content"),
        )
    )


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_changes = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("view_asymmetry", master="local[16]",
                      shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="atlas_viewasym_")
    out = {"n_keys": n_keys, "n_changes": n_changes}
    try:
        sink = LakehouseSink(spark, os.path.join(work, "t"),
                             n_buckets=64, emit_changes=True,
                             cdf_preimage=True)
        sink.ensure()
        sink.merge(_batch(spark, n_keys, 0, n_keys), 0)
        view = IncrementalAggView(spark, os.path.join(work, "v"),
                                  ["repo"], dict(MEASURES))
        view.bootstrap(sink)
        sink.merge(_batch(spark, n_changes, n_keys, n_keys), 1)
        feed_rows = sink.changes(1).count()
        out["feed_rows"] = feed_rows

        # snapshot the bootstrapped view; each timing iteration starts
        # from this exact state (re-folding an epoch on top of a state
        # that already folded it would double-apply the delta — the
        # pointer+state pair is what makes the real crash path safe)
        snap = os.path.join(work, "v_snap")
        shutil.copytree(view.path, snap)
        refresh, recompute = [], []
        for _ in range(3):
            shutil.rmtree(view.path)
            shutil.copytree(snap, view.path)
            t0 = time.monotonic()
            assert view.refresh(sink)["applied_epochs"] == [1]
            refresh.append(time.monotonic() - t0)

            t0 = time.monotonic()
            direct = sink.read().groupBy("repo").agg(
                F.count("*").alias("n_rows"),
                F.sum(F.length("content")).alias("total_chars"),
            )
            direct.write.mode("overwrite").parquet(
                os.path.join(work, "direct")
            )
            recompute.append(time.monotonic() - t0)

        out["refresh_sec"] = round(min(refresh), 3)
        out["recompute_sec"] = round(min(recompute), 3)
        out["ratio"] = round(min(recompute) / min(refresh), 2)
        # equality check: the folded view == the direct aggregate
        a = sorted(map(tuple, view.state().collect()))
        b = sorted(map(tuple,
                       spark.read.parquet(os.path.join(work, "direct"))
                       .collect()))
        out["states_equal"] = a == b
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
