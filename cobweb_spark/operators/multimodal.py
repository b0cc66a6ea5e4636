"""Multimodal columns: opaque binary payloads + typed metadata.

The reference carries binary bodies as Base64 strings in the content hash
(``lib/cobweb.rb:232``, decoded on export ``lib/export_command.rb:74``).
Here media is first-class: an opaque ``binary`` column plus typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

The actual image/audio decode is STUBBED (no codec libs in this
container): ``decode_media`` produces deterministic fake decode metadata
from the payload bytes when PIL/soundfile are absent, and raises
NotImplementedError per-format when strict=True. The Spark-side plumbing —
schema, batch shape, partitioning — is real and tested; swapping in a real
decoder changes only the inner function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _kind_for_ref(ref: str) -> str:
    ref = (ref or "").lower()
    if ref.endswith((".jpg", ".jpeg", ".png", ".gif")):
        return "image"
    if ref.endswith((".mp3", ".wav", ".ogg")):
        return "audio"
    if ref.endswith((".mp4", ".webm")):
        return "video"
    return "binary"


def media_payloads(documents: DataFrame) -> DataFrame:
    """Materialize (doc_id, media_ref, payload, media_kind) rows from media
    spans. Payloads are deterministic bytes derived from the ref (the
    corpus is synthetic; a real crawl stores the fetched body here)."""
    refs = (
        documents.select(
            "doc_id", F.explode("spans").alias("s")
        )
        .filter(F.col("s.media_ref").isNotNull())
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )

    def gen(iterator):
        for pdf in iterator:
            payloads = [
                hashlib.md5(r.encode()).digest() * 16  # 256 fake bytes
                for r in pdf["media_ref"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "payload": payloads,
                    "media_kind": pdf["media_ref"].map(_kind_for_ref),
                }
            )

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode / feature-extract media payloads (Arrow-batched).

    Real decoders are absent in this container: with strict=True this
    raises NotImplementedError for image/audio/video kinds; otherwise it
    emits a deterministic 16-dim byte-histogram feature (the fake decode),
    exercising the exact batch shape a real decoder would use.
    """

    def run(iterator):
        try:
            import PIL.Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in iterator:
            if strict and not have_pil:
                kinds = set(pdf["media_kind"]) - {"binary"}
                if kinds:
                    raise NotImplementedError(
                        f"no codec available for media kinds {sorted(kinds)}"
                    )
            feats, widths, heights, nbytes = [], [], [], []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                hist, _ = np.histogram(b, bins=16, range=(0, 256))
                total = max(hist.sum(), 1)
                feats.append((hist / total).astype(np.float32))
                nbytes.append(len(b))
                # fake dimensions derived from payload bytes
                widths.append(int(b[:2].sum()) + 1 if len(b) >= 2 else 1)
                heights.append(int(b[2:4].sum()) + 1 if len(b) >= 4 else 1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)
