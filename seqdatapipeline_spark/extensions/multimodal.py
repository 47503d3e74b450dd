"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real and tested — binary payload columns,
metadata maps, Arrow-batched `mapInPandas` with explicit output
schemas, partition-size control for large blobs. The codec step has
two paths: `fake=True` runs a deterministic byte-derived stand-in
(always available — the oracle-parity path), and `fake=False` runs a
real Pillow decode/thumbnail when PIL is importable on the executors.
In this sandbox PIL is absent, so the real path raises
NotImplementedError with the stand-in hint; the surrounding batch
shapes, schemas and partitioning are identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def to_media(df: DataFrame, id_col: str, payload_text_col: str, kind: str = "image") -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the ingestion shape for multimodal rows. (Here text is encoded as
    the stand-in payload; a real pipeline reads bytes via
    `spark.read.format('binaryFile')`.) Rows with a NULL payload are
    excluded AT INGESTION — a missing blob cannot be decoded, resized,
    or frame-sampled, and each downstream stand-in was inventing its
    own default (0-byte features vs NULL vs target size), which can
    never agree across engines (dirty-parity r11)."""
    df = df.filter(F.col(payload_text_col).isNotNull())
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(payload_text_col), "utf-8").alias("payload"),
        F.create_map(
            F.lit("codec"), F.lit("raw"), F.lit("origin"), F.col(id_col).cast("string")
        ).alias("meta"),
    )


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: byte
    histogram moments. Replaces (e.g.) a resize+embed step."""
    if not payload:
        return [0.0] * n
    buckets = [0] * n
    for i, byte in enumerate(payload):
        buckets[byte % n] += 1
    total = float(len(payload))
    # Raw IEEE division — callers round for display so results stay
    # bit-identical across engines.
    return [b / total for b in buckets]


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _pil_features(payload: bytes) -> list[float]:
    """Real image featurizer (runs only when Pillow is importable):
    width, height, n_channels, then per-channel mean/255 — a
    deterministic, resolution-independent summary with the same
    array<double> shape as the stand-in."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        rgb = im.convert("RGB")
        w, h = rgb.size
        px = list(rgb.getdata())
        n = float(len(px)) or 1.0
        means = [sum(c[i] for c in px) / n / 255.0 for i in range(3)]
    return [float(w), float(h), 3.0] + means


def decode_media(df: DataFrame, fake: bool = False, batch_partitions: int | None = None) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    `mapInPandas`. With `fake=True` the deterministic byte-histogram
    featurizer runs (the oracle-parity path, available everywhere).
    With `fake=False` the real image decode runs when Pillow is
    importable on the executors; in this sandbox it is not, so the
    call raises NotImplementedError with the stand-in hint —
    the Spark-side plumbing (schema, batching, partitioning) is
    identical on both paths.

    `batch_partitions` repartitions first so each Arrow batch holds a
    bounded number of large blobs (memory control at scale)."""
    if not fake and not _pil_available():
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "call decode_media(df, fake=True) for the deterministic stand-in"
        )
    src = df.repartition(batch_partitions) if batch_partitions else df
    featurize = _fake_features if fake else _pil_features

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "features": pdf["payload"].map(featurize),
                }
            )

    return src.mapInPandas(_decode, MEDIA_FEATURES)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling analog on the stand-in payloads: take one byte
    every `every_n_bytes` as a 'frame' marker — exercises the
    explode-per-frame row shape a video pipeline produces."""
    n = F.length("payload")
    idx = F.sequence(F.lit(1), F.greatest((n / every_n_bytes).cast("int"), F.lit(1)))
    return df.select(
        "media_id",
        F.posexplode(idx).alias("frame_no", "__i"),
    ).drop("__i")


def _pil_resize(payload: bytes, max_px: int) -> bytes:
    """Real thumbnail (runs only when Pillow is importable): bound the
    longest edge at ``max_px``, re-encode as PNG (deterministic — PNG
    has no timestamp/quality variance)."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        thumb = im.convert("RGB")
        thumb.thumbnail((max_px, max_px))
        out = BytesIO()
        thumb.save(out, format="PNG")
    return out.getvalue()


def resize_media(df: DataFrame, target_bytes: int = 64, fake: bool = False) -> DataFrame:
    """Resize/transcode step via Arrow-batched `mapInPandas`. With
    `fake=True` (oracle-parity path, available everywhere) the payload
    is deterministically truncated to ``target_bytes``. With
    `fake=False` a real PIL thumbnail runs when Pillow is importable
    (``target_bytes`` then bounds the longest edge in pixels); in this
    sandbox it is not, so the call raises NotImplementedError with the
    stand-in hint. Batch shape, binary output column and metadata
    update are identical on both paths."""
    if not fake and not _pil_available():
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "call resize_media(df, fake=True) for the deterministic stand-in"
        )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            clipped = pdf["payload"].map(
                (lambda p: bytes(p[:target_bytes]) if p is not None else b"")
                if fake
                else (lambda p: _pil_resize(p, target_bytes) if p is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": clipped,
                    "n_bytes": clipped.map(len),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("n_bytes", LongType()),
        ]
    )
    return df.mapInPandas(_resize, schema)
