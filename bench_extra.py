"""Round-8 optimization harness (guide §1): per-query noop-sink timing,
``.explain("formatted")`` capture, and a scaled-table maker so
optimizations can be validated at the driver's larger measurement SF
(BENCH_r07 ran sf=1.0) without touching the read-only testdata.

This file is *extra* tooling — ``bench.py`` stays frozen for the
driver's measurement.  Examples:

  # capture plans for three queries into plans/r08/<q>_<tag>.txt
  python bench_extra.py --explain-tag before \
      --queries q_lww_latest,q_ngram_jaccard --sf-dir /root/testdata/sf0.1

  # time queries (1 warmup + best/median of N noop-sink runs)
  python bench_extra.py --queries all --repeat 3 --sf-dir /tmp/sf1x

  # build a 10x scaled copy of sf0.1 (ids offset per replica)
  python bench_extra.py --make-scale 10 --from-dir /root/testdata/sf0.1 \
      --out /tmp/sf1x
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALED_TABLES = ["events", "documents", "embeddings", "customer", "orders"]


def make_scale(factor: int, src: str, out: str) -> None:
    """Concatenate each table ``factor`` times with id offsets — a
    perf-shaped stand-in for the driver's larger SF (NOT semantically
    identical: distributions repeat; good for timing, not oracles)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for name in SCALED_TABLES:
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        t = pq.read_table(path)
        ids = {
            "events": ["event_id", "user_id"],
            "documents": ["doc_id"],
            "embeddings": ["vec_id"],
            "customer": ["c_custkey"],
            "orders": ["o_orderkey", "o_custkey"],
        }[name]
        spans = {c: (pc.max(t[c]).as_py() or 0) + 1 for c in ids
                 if c in t.column_names}
        parts = []
        for k in range(factor):
            tk = t
            if k:
                for c, span in spans.items():
                    idx = tk.column_names.index(c)
                    tk = tk.set_column(
                        idx, c, pc.add(tk[c], k * span)
                    )
            parts.append(tk)
        big = pa.concat_tables(parts)
        pq.write_table(big, os.path.join(out, f"{name}.parquet"),
                       row_group_size=len(big))
        print(f"{name}: {len(t)} -> {len(big)} rows", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma list or 'all' or 'bench' (the 9 timed)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--explain-tag", default=None,
                    help="write plans/r08/<q>_<tag>.txt per query")
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--make-scale", type=int, default=None)
    ap.add_argument("--from-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf_scaled")
    args = ap.parse_args()

    if args.make_scale:
        make_scale(args.make_scale, args.from_dir, args.out)
        return

    from atlas_spark.operators import QUERIES
    from atlas_spark.session import get_spark

    bench_nine = [
        "q_lww_latest", "q_watermark_agg", "q_sha256_content",
        "q_minhash_signature", "q_ngram_jaccard", "q_embedding_topk",
        "q_json_extract", "q_salted_agg", "q_state_diff",
    ]
    if args.queries in (None, "bench"):
        names = bench_nine
    elif args.queries == "all":
        names = list(QUERIES)
    else:
        names = args.queries.split(",")

    spark = get_spark("atlas_bench_extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    here = os.path.dirname(os.path.abspath(__file__))
    plans_dir = os.path.join(here, "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = QUERIES[name](spark, args.sf_dir)
        if args.explain_tag:
            p = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(
                    plans_dir, f"{name}_{args.explain_tag}.txt"), "w") as f:
                f.write(p)
        df.write.format("noop").mode("overwrite").save()  # warmup
        raw = []
        for _ in range(args.repeat):
            t0 = time.monotonic()
            QUERIES[name](spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            raw.append(round(time.monotonic() - t0, 3))
        results[name] = {"best": min(raw), "runs": raw}
        print(f"{name}: best={min(raw)} runs={raw}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
