"""Similarity search & near-dup fingerprints beyond the SQL catalog.

* ``brute_force_topk`` — exact cosine top-k (the ANN baseline); one
  narrow scan, JVM-side higher-order functions, no UDF.
* ``IvfIndex`` — IVF-style ANN: k coarse centroids partition the
  vectors (bucket column → the parquet/bucket pruning path at scale);
  a query probes only ``nprobe`` nearest cells.  At 100 TB the cell id
  becomes the table's partition column so a probe is a partition-pruned
  scan, not a full pass.
* ``simhash16`` — 16-bit SimHash over word CRC32s (columnar aggregate
  fold, one expression, no UDF) + banded near-dup pairing.

All deterministic — no sampling RNG; centroids are the k lowest-id
vectors (documented, testable choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cos_sql(col: str, qlit: str) -> str:
    a = f"CAST({col} AS ARRAY<DOUBLE>)"
    return (
        f"aggregate(zip_with({a}, {qlit}, (x, y) -> x * y), 0.0D, "
        f"(acc, v) -> acc + v) / "
        f"(sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v)) * "
        f"sqrt(aggregate({qlit}, 0.0D, (acc, v) -> acc + v * v)))"
    )


def _qlit(vec) -> str:
    return "array(" + ", ".join(repr(float(v)) + "D" for v in vec) + ")"


def brute_force_topk(df: DataFrame, vec, k: int = 10,
                     id_col: str = "vec_id",
                     emb_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k vs a literal query vector."""
    cos = F.expr(_cos_sql(emb_col, _qlit(vec)))
    return (
        df.select(id_col, cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


class IvfIndex:
    """Inverted-file ANN: assign every vector to its nearest of
    ``n_cells`` centroids; search probes the ``nprobe`` best cells."""

    def __init__(self, n_cells: int = 16, nprobe: int = 4,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        self.n_cells = n_cells
        self.nprobe = nprobe
        self.id_col = id_col
        self.emb_col = emb_col
        self.centroids: list[list[float]] | None = None
        self.assigned: DataFrame | None = None

    def build(self, df: DataFrame) -> DataFrame:
        """Deterministic coarse quantizer: centroids = the n_cells
        lowest-id vectors (k-means would be the production upgrade; the
        index structure and pruning behavior are identical)."""
        rows = (
            df.orderBy(self.id_col)
            .limit(self.n_cells)
            .select(F.col(self.emb_col).cast("array<double>").alias("c"))
            .collect()
        )
        self.centroids = [list(r["c"]) for r in rows]
        # nearest-centroid id per vector: greatest cosine, one pass —
        # built as a single SQL expr over a literal centroid matrix
        cell = self._argmax_cell_expr()
        self.assigned = df.withColumn("_cell", cell)
        return self.assigned

    def _argmax_cell_expr(self):
        sims = [
            f"named_struct('s', {_cos_sql(self.emb_col, _qlit(c))}, 'i', {i})"
            for i, c in enumerate(self.centroids)
        ]
        arr = "array(" + ", ".join(sims) + ")"
        return F.expr(
            f"aggregate({arr}, named_struct('s', -2.0D, 'i', -1), "
            "(acc, x) -> CASE WHEN x.s > acc.s THEN x ELSE acc END).i"
        ).cast("int")

    def _probe_cells(self, vec) -> list[int]:
        import math

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb) if na and nb else -2.0

        scored = sorted(
            ((cos(vec, c), i) for i, c in enumerate(self.centroids)),
            reverse=True,
        )
        return [i for _, i in scored[: self.nprobe]]

    def search(self, vec, k: int = 10) -> DataFrame:
        """Probe nprobe cells, exact cosine inside them.  The `_cell`
        filter is the partition-pruning hook at scale."""
        assert self.assigned is not None, "call build() first"
        cells = self._probe_cells(list(map(float, vec)))
        cand = self.assigned.filter(F.col("_cell").isin(cells))
        return brute_force_topk(cand, vec, k, self.id_col, self.emb_col)


# --------------------------------------------------------------- simhash

def simhash16(df: DataFrame, text_col: str = "text",
              out_col: str = "simhash") -> DataFrame:
    """16-bit SimHash over word CRC32s, one columnar fold:
    bit i of the hash = sign of Σ_words (±1 by bit i of crc32(word)).
    CRC32 is chosen because it is bit-identical in Spark (crc32) and
    Python (zlib.crc32) — the pytest oracle recomputes it exactly."""
    ws = f"filter(split({text_col}, ' '), w -> w != '')"
    votes = (
        f"aggregate(transform({ws}, w -> crc32(encode(w, 'utf-8'))), "
        "array_repeat(0L, 16), "
        "(acc, h) -> zip_with(acc, transform(sequence(0, 15), "
        "i -> CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1L ELSE -1L END), "
        "(a, b) -> a + b))"
    )
    bits = (
        f"aggregate(zip_with({votes}, transform(sequence(0, 15), "
        "i -> shiftleft(1L, i)), (v, p) -> CASE WHEN v >= 0 THEN p ELSE 0L END), "
        "0L, (acc, x) -> acc + x)"
    )
    return df.withColumn(out_col, F.expr(bits))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs: band on the two simhash bytes (a pair within
    hamming ≤ max_hamming shares at least one identical byte for
    16-bit/2-band), verify hamming exactly on candidates."""
    s = simhash16(df, text_col).select(
        F.col(id_col), F.col("simhash"),
        (F.col("simhash") % 256).alias("band_lo"),
        (F.col("simhash") / 256).cast("long").alias("band_hi"),
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = None
    for band in ("band_lo", "band_hi"):
        p = (
            a.join(b, F.col(f"a.{band}") == F.col(f"b.{band}"))
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct().filter(F.col("hamming") <= max_hamming)
