"""Evidence for the MoR cost model → BENCH/MOR.md.

The headline bench cannot show merge-on-read's advantage: its final
table (~380k rows) is ~1% of each 32M-event epoch, so copy-on-write's
touched-bucket rewrite is cheap there and the two modes measure within
noise (BENCH_r03).  MoR's advantage is structural — a merge costs
O(|batch|) instead of O(touched buckets) — so it appears at the
OPPOSITE shape: a small batch into a big table.  This script measures
exactly that: bulk-load N keys, then time the merge of a small update
batch under each mode (same code, same session, best of 3).
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

from atlas_spark.session import get_spark
from atlas_spark.sinks import LakehouseSink

N_KEYS = int(os.environ.get("MOR_TABLE_KEYS", "2000000"))
BATCH = int(os.environ.get("MOR_BATCH_KEYS", "20000"))


def _rows(spark, n, seq, prefix):
    return (
        spark.range(n)
        .select(
            F.lit(seq).cast("bigint").alias("seq"),
            F.lit("U" if seq > 1 else "I").alias("op"),
            F.concat(F.lit("r"), (F.col("id") % 1000).cast("string")).alias("repo"),
            F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
            F.concat(F.lit(prefix), F.col("id").cast("string")).alias("commit"),
            F.lit("py").alias("lang"),
            F.concat(F.lit(prefix * 20), F.col("id").cast("string")).alias("content"),
        )
    )


def main() -> None:
    spark = get_spark("mor_asymmetry", master="local[8]", shuffle_partitions=8)
    base = _rows(spark, N_KEYS, 1, "c")
    upd = _rows(spark, BATCH, 2, "u")
    out = {}
    for mode in ("cow", "mor"):
        root = tempfile.mkdtemp(prefix=f"mor_asym_{mode}_")
        try:
            sink = LakehouseSink(spark, root, n_buckets=64, mode=mode)
            sink.ensure()
            sink.merge(base, 0)  # bulk load, untimed
            best = None
            for e in range(1, 4):  # best of 3 small merges
                t0 = time.monotonic()
                sink.merge(upd.withColumn("seq", F.col("seq") + e), e)
                dt = time.monotonic() - t0
                best = dt if best is None or dt < best else best
            rows = sink.read().count()
            out[mode] = {"small_merge_sec": round(best, 3), "rows": rows}
        finally:
            shutil.rmtree(root, ignore_errors=True)
    ratio = out["cow"]["small_merge_sec"] / out["mor"]["small_merge_sec"]
    out["cow_over_mor"] = round(ratio, 2)
    out["table_keys"] = N_KEYS
    out["batch_keys"] = BATCH
    print(json.dumps(out))

    md = f"""# MoR vs CoW — the asymmetry shape

Same code, same session, best-of-3: merge a {BATCH:,}-key update batch
into a {N_KEYS:,}-key table (the steady-small-batch stream shape the
headline bench cannot show — its table is ~1% of each epoch).

| mode | small-batch merge (s) | table rows after |
|---|---|---|
| copy-on-write | {out['cow']['small_merge_sec']} | {out['cow']['rows']:,} |
| merge-on-read | {out['mor']['small_merge_sec']} | {out['mor']['rows']:,} |

**CoW / MoR = {out['cow_over_mor']}×** — merge-on-read appends the
batch's winners (O(|batch|), never reads the existing side:
`test_mor_merge_never_reads_existing`), while copy-on-write rewrites
every touched bucket (a {BATCH:,}-key batch touches all 64 buckets,
so effectively the whole table).  At the headline-bench shape the two
measure within noise (BENCH_r03: MoR 830k ev/s vs CoW 574k at sf0.1);
`compact()` amortizes MoR's read-side cost.

```json
{json.dumps(out)}
```
"""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "MOR.md")
    with open(path, "w") as f:
        f.write(md)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
