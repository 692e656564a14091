"""Custom payload codec — the designated vectorized-UDF surface.

The north rule mandates vectorized pandas/Arrow UDFs for "payload
decode" where builtins can't express it.  Plain JSON payloads use the
builtin ``from_json`` (plans/lww.py — always prefer that); this module
handles the case the builtins genuinely can't: a source whose payloads
arrive **packed** (zlib-compressed, base64-armored) — e.g. a binlog
shipper squeezing wide rows.

Arrow-batched ``pandas_udf``: Python is entered once per ~10k-row
batch; zlib/base64 run in C.  Zero per-row Python↔JVM round trips.
"""

from __future__ import annotations

import base64
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def pack_payload_py(raw: str) -> str:
    """Driver/test-side reference packer (one value)."""
    return base64.b64encode(zlib.compress(raw.encode("utf-8"), 6)).decode("ascii")


@pandas_udf("string")
def unpack_payload(packed: pd.Series) -> pd.Series:
    """base64 → zlib-inflate → utf-8 JSON string, vectorized."""
    def one(v):
        if v is None:
            return None
        return zlib.decompress(base64.b64decode(v)).decode("utf-8")

    return packed.map(one)


@pandas_udf("string")
def pack_payload(raw: pd.Series) -> pd.Series:
    """Inverse (useful for writing compact changelogs)."""
    def one(v):
        if v is None:
            return None
        return base64.b64encode(zlib.compress(v.encode("utf-8"), 6)).decode("ascii")

    return raw.map(one)


def decode_packed(df: DataFrame, packed_col: str = "payload",
                  out_col: str = "payload") -> DataFrame:
    """Swap a packed payload column for its JSON plaintext; downstream
    (schema-evolution projection, from_json) is unchanged."""
    return df.withColumn(out_col, unpack_payload(F.col(packed_col)))
