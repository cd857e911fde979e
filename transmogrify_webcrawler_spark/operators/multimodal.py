"""Multimodal column plumbing: image/audio/video as opaque BINARY columns with
typed metadata (the brief's multimodal requirement).

The image/audio decode libraries are NOT in this container, so the decode
kernels are deterministic fakes clearly marked as stubs — but every Spark-side
piece is real and tested: the schema contract, the mapInPandas iterator shape,
Arrow batch sizing for fat binary columns, and the partitioning story
(repartition on a content-hash so giant media files spread evenly).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..oracle.extract import sniff_mimetype

MEDIA_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mimetype", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("feature", BinaryType()),
])


def _fake_decode(payload: bytes, mimetype: str) -> dict:
    """STUB: a real deployment plugs Pillow/ffmpeg here. This fake is
    deterministic in the payload bytes so tests are stable. Raises for
    genuinely unsupported types, mirroring a real decoder."""
    if mimetype.startswith("image/"):
        w = 1 + payload[0] if payload else 1
        h = 1 + payload[-1] if payload else 1
        return dict(width=int(w), height=int(h), duration_s=None,
                    feature=bytes([sum(payload) % 256] * 8))
    if mimetype.startswith(("audio/", "video/")):
        return dict(width=None, height=None,
                    duration_s=float(len(payload)) / 1000.0,
                    feature=bytes([len(payload) % 256] * 8))
    raise NotImplementedError(f"no decoder for {mimetype}")


def extract_media_meta(media: DataFrame, id_col: str = "media_id",
                       payload_col: str = "payload") -> DataFrame:
    """mapInPandas over binary batches: sniff type, decode (stub), emit typed
    metadata + an 8-byte feature. Spark plumbing (schema, batching, iterator
    protocol) is production-shaped; only the decode kernel is fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                mt = sniff_mimetype(payload, "")
                try:
                    meta = _fake_decode(payload, mt)
                except NotImplementedError:
                    meta = dict(width=None, height=None, duration_s=None,
                                feature=None)
                out.append(dict(media_id=mid, mimetype=mt,
                                n_bytes=len(payload), **meta))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             MEDIA_META_SCHEMA.fields])

    # spread fat rows evenly: partition on content hash, not arrival order
    spread = media.repartition(F.pmod(F.xxhash64(payload_col), F.lit(64)))
    return spread.mapInPandas(run, MEDIA_META_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0,
                      id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling plumbing: expands each media row into the frame
    timestamps a decoder would extract (sequence + explode, Catalyst-only;
    the pixel decode itself is the stub above)."""
    meta = extract_media_meta(media, id_col=id_col)
    vids = meta.filter(F.col("duration_s").isNotNull())
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.col("duration_s") / F.lit(every_s)).cast("int"),
            )
        ).alias("frame_idx"),
    ).withColumn("t_offset_s", F.col("frame_idx") * F.lit(every_s))
