"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a typed metadata
struct, processed via ``mapInPandas`` (Arrow-batched; the iterator
shape keeps peak memory at one batch, not one partition — the right
plumbing for 100 MB media blobs at 100 TB scale).

The actual decode (PIL/ffmpeg/etc.) is NOT available in this
container, so the codec layer is stubbed: ``FakeImageCodec`` derives
deterministic pseudo-metadata from the bytes (so tests assert real
plumbing end-to-end), and ``decode_real`` raises NotImplementedError
with the dependency named.  Swapping in a real codec changes ONE
function; the Spark plan (schema, partitioning, batch iteration,
column pruning) is production-shaped and under test.

Reference analog: none (atlas is text/JSON only) — this is part of the
training-data-pipeline surface the engine adds (task brief).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime:string, n_bytes:bigint, source:string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, "
    "width int, height int, checksum string"
)


def attach_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Demo wrapper: pack a text column as a binary media payload with
    typed metadata (the ingest shape for real blobs)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).cast("bigint").alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


class FakeImageCodec:
    """Deterministic stand-in for a real decoder: 'width'/'height' are
    derived from the payload bytes, 'checksum' is a real sha256."""

    @staticmethod
    def decode(payload: bytes) -> dict:
        import hashlib

        h = hashlib.sha256(payload or b"").digest()
        return {
            "width": 16 + h[0] % 64,
            "height": 16 + h[1] % 64,
            "checksum": h.hex(),
        }


def decode_real(payload: bytes) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "real image decode requires Pillow/libvips, not present in this "
        "container — plug a codec implementing .decode(bytes)->dict here"
    )


def extract_features(df: DataFrame, codec=FakeImageCodec) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Column pruning works through mapInPandas inputs: only the columns
    the downstream consumes are materialized per Arrow batch.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(
                lambda b: codec.decode(bytes(b) if b is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "width": feats.map(lambda d: d["width"]),
                    "height": feats.map(lambda d: d["height"]),
                    "checksum": feats.map(lambda d: d["checksum"]),
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int"
)


def resize_media(df: DataFrame, max_side: int = 32,
                 codec=FakeImageCodec) -> DataFrame:
    """Resize shape: decode → scale to fit ``max_side`` → re-encode.

    The stub 'resize' deterministically truncates the payload in
    proportion to the scale factor and emits the new dimensions — the
    Spark-side contract (mapInPandas batching, binary in/out, metadata
    columns) is exactly what a Pillow-backed codec drops into.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, payloads = [], [], []
            for b in pdf["payload"]:
                raw = bytes(b) if b is not None else b""
                meta = codec.decode(raw)
                scale = min(
                    1.0, max_side / max(meta["width"], meta["height"], 1)
                )
                w = max(1, int(meta["width"] * scale))
                h = max(1, int(meta["height"] * scale))
                keep = max(1, int(len(raw) * scale)) if raw else 0
                ws.append(w)
                hs.append(h)
                payloads.append(raw[:keep])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": ws,
                    "height": hs,
                }
            )

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling shape for video payloads: one row per sampled
    frame index (the decode itself is the stubbed codec).  Built-in
    sequence+explode — the fan-out stays JVM-side; only the per-frame
    decode would enter Python."""
    n_frames = (F.length(F.col("payload")) / 100 + 1).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
