"""Multimodal columns: opaque binary payloads + typed metadata.

The reference carries binary bodies as Base64 strings in the content hash
(``lib/cobweb.rb:232``, decoded on export ``lib/export_command.rb:74``).
Here media is first-class: an opaque ``binary`` column plus typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

Decode is REAL for PNG, WAV, baseline JPEG and Y4M video (pure
numpy/stdlib codecs, ``functions/media_codecs.py`` — format sniffed from
magic bytes, never the extension): width/height from the PNG IHDR chunk
or the JPEG SOF frame header, sample_rate/channels/samples from the RIFF
headers, frame geometry/count from the YUV4MPEG2 stream header, plus a
16-bin byte histogram feature over the payload. Pixel-level work (resize,
frame sampling) is likewise real for PNG, baseline-grayscale JPEG, WAV
PCM and Y4M planes. Formats needing codec libraries absent from this
container (MP3/MP4/GIF) raise NotImplementedError under ``strict=True``
and emit null dimensions otherwise.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.media_codecs import (
    decode_jpeg_header,
    decode_png_header,
    decode_wav_header,
    decode_y4m_header,
    sniff_format,
)

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
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

MEDIA_STORE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)


def _kind_for_ref(ref: str) -> str:
    ref = (ref or "").lower()
    if ref.endswith((".jpg", ".jpeg", ".png", ".gif")):
        return "image"
    if ref.endswith((".mp3", ".wav", ".ogg")):
        return "audio"
    if ref.endswith((".mp4", ".webm", ".y4m")):
        return "video"
    return "binary"


def media_refs(documents: DataFrame) -> DataFrame:
    """(doc_id, media_ref) rows from media spans."""
    return (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.media_ref").isNotNull())
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )


# blob stores under this many rows broadcast to the payload join; above
# it (any real crawl's media table — binary payloads would OOM the driver
# long before the row count matters) the plain shuffled equi-join runs,
# the stand-in for the bucketed blob-table join at 100 TB.
MEDIA_STORE_BROADCAST_MAX_ROWS = 10_000


def media_payloads(
    documents: DataFrame,
    media_store: DataFrame | None = None,
    broadcast_store: bool | None = None,
) -> DataFrame:
    """Materialize (doc_id, media_ref, payload, media_kind) rows.

    With ``media_store`` (the blob table: media_ref → payload binary — a
    real crawl stores fetched bodies there), payloads come from an
    equi-join on media_ref. ``broadcast_store``: True/False forces the
    join strategy; None counts the store's keys once (payload column
    pruned from the count scan) and broadcasts only genuinely small
    stores — a blob table with binary payloads must never be broadcast.
    Without a store, payloads fall back to deterministic synthetic bytes
    (plumbing-only mode).
    """
    refs = media_refs(documents)
    if media_store is not None:
        if broadcast_store is None:
            broadcast_store = (
                media_store.select("media_ref")
                .limit(MEDIA_STORE_BROADCAST_MAX_ROWS + 1)
                .count()
                <= MEDIA_STORE_BROADCAST_MAX_ROWS
            )
        store = media_store.select(
            "media_ref",
            "payload",
            F.col("media_kind").alias("__store_kind"),
        )
        if broadcast_store:
            store = F.broadcast(store)
        return (
            refs.join(store, "media_ref", "left")
            .select(
                "doc_id",
                "media_ref",
                "payload",
                F.coalesce(
                    F.col("__store_kind"), F.lit("unknown")
                ).alias("media_kind"),
            )
        )

    def gen(iterator):
        for pdf in iterator:
            payloads = [
                hashlib.md5(r.encode()).digest() * 16  # 256 synthetic bytes
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
    """Decode / feature-extract media payloads (Arrow-batched mapInPandas).

    PNG and WAV decode for real (header parse, stdlib only); every payload
    additionally gets a 16-bin byte-histogram feature. Unknown formats emit
    null dimensions — or, with ``strict=True``, raise NotImplementedError
    (the formats that need codec libs this container doesn't have).
    """

    def run(iterator):
        for pdf in iterator:
            n = len(pdf)
            fmt = [""] * n
            widths = np.full(n, np.nan)
            heights = np.full(n, np.nan)
            rates = np.full(n, np.nan)
            samples = np.full(n, np.nan)
            nbytes = np.zeros(n, dtype=np.int64)
            feats = []
            for i, payload in enumerate(pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                nbytes[i] = len(b)
                arr = np.frombuffer(b, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=16, range=(0, 256))
                feats.append(
                    (hist / max(hist.sum(), 1)).astype(np.float32)
                )
                f = sniff_format(b)
                fmt[i] = f
                if f == "png":
                    wh = decode_png_header(b)
                    if wh:
                        widths[i], heights[i] = wh
                elif f == "jpeg":
                    wh = decode_jpeg_header(b)
                    if wh:
                        widths[i], heights[i] = wh
                elif f == "wav":
                    hdr = decode_wav_header(b)
                    if hdr:
                        rates[i], _ch, samples[i] = hdr
                elif f == "y4m":
                    hdr = decode_y4m_header(b)
                    if hdr:
                        widths[i], heights[i], rates[i], samples[i] = hdr
                elif strict:
                    raise NotImplementedError(
                        f"no codec for payload format of "
                        f"{pdf['media_ref'].iloc[i]!r} "
                        f"(kind={pdf['media_kind'].iloc[i]!r})"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "format": fmt,
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "n_samples": pd.Series(samples, dtype="Int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("resized_n_bytes", T.IntegerType()),
        T.StructField("resized_payload", T.BinaryType()),
    ]
)


def resize_media(
    media: DataFrame, max_dim: int = 32, strict: bool = False
) -> DataFrame:
    """Resize image payloads to fit ``max_dim`` (aspect preserved,
    integer-floor target dims — `functions/media_codecs.py:fit_dims`).

    REAL for PNG and JPEG: pixels decoded (PNG: inflate+unfilter; JPEG:
    baseline-DCT Huffman decode, ``functions/media_codecs.py``),
    nearest-neighbor resampled (numpy), re-encoded in the same format,
    and the reported new dims come from re-decoding the emitted
    payload's header — a per-row round-trip proof. Payloads whose
    header parses but whose pixel stream this decoder doesn't cover
    (interlaced/filtered PNGs, progressive or multi-component JPEGs)
    keep the planned target dims with a null payload; wholly
    undecodable ones emit null dims — or raise under ``strict=True``.
    Non-images pass through with null dims. Arrow-batched mapInPandas;
    per-row work is bounded by payload size, so batches stay
    executor-sized at any corpus scale.
    """
    from ..functions.media_codecs import (
        decode_jpeg_pixels,
        decode_png_pixels,
        encode_gray_jpeg,
        encode_gray_png,
        fit_dims,
        resize_gray_nn,
    )

    def run(iterator):
        for pdf in iterator:
            n = len(pdf)
            fmt = [""] * n
            w = np.full(n, np.nan)
            h = np.full(n, np.nan)
            nw = np.full(n, np.nan)
            nh = np.full(n, np.nan)
            nb = np.full(n, np.nan)
            out_payloads: list[bytes | None] = [None] * n
            for i, payload in enumerate(pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                f = sniff_format(b)
                fmt[i] = f
                if f not in ("png", "jpeg"):
                    continue  # non-images: null dims, null payload
                decode_header, decode_pixels, encode = (
                    (decode_png_header, decode_png_pixels, encode_gray_png)
                    if f == "png"
                    else (
                        decode_jpeg_header,
                        decode_jpeg_pixels,
                        encode_gray_jpeg,
                    )
                )
                wh = decode_header(b)
                if wh is None:
                    if strict:
                        raise ValueError(
                            f"undecodable {f} header in payload of "
                            f"{pdf['media_ref'].iloc[i]!r}"
                        )
                    continue
                ow, oh = wh
                w[i], h[i] = ow, oh
                tw, th = fit_dims(ow, oh, max_dim)
                nw[i], nh[i] = tw, th
                try:
                    pix = decode_pixels(b)
                except Exception:
                    pix = None
                if pix is None or len(pix) != ow * oh:
                    if strict:
                        raise NotImplementedError(
                            f"{f} pixel stream of "
                            f"{pdf['media_ref'].iloc[i]!r} is outside "
                            "this decoder's coverage; planned dims "
                            "emitted under strict=False"
                        )
                    continue  # planned dims, null payload
                resized = encode(
                    resize_gray_nn(pix, ow, oh, tw, th), tw, th
                )
                # report dims by re-decoding our own output
                nw[i], nh[i] = decode_header(resized)
                nb[i] = len(resized)
                out_payloads[i] = resized
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "format": fmt,
                    "width": pd.Series(w, dtype="Int32"),
                    "height": pd.Series(h, dtype="Int32"),
                    "new_width": pd.Series(nw, dtype="Int32"),
                    "new_height": pd.Series(nh, dtype="Int32"),
                    "resized_n_bytes": pd.Series(nb, dtype="Int32"),
                    "resized_payload": out_payloads,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("sampled_crc32", T.LongType()),
    ]
)


def frame_sample_media(
    media: DataFrame, every_k: int = 4, strict: bool = False
) -> DataFrame:
    """Sample every ``every_k``-th frame from time-series payloads.

    REAL for WAV (audio) and Y4M (video): the WAV PCM data chunk or the
    Y4M FRAME-delimited planes are parsed, every k-th frame is taken,
    and ``sampled_crc32`` checksums the sampled bytes — proving the
    decimation touched real frame data, not just the header (pytest
    pins the crcs against independent Python references). Compressed
    video containers (mp4/webm) have no codec in this container: their
    rows emit null counts, or raise under ``strict=True`` — the
    plumbing (schema, batching, per-kind dispatch) is the real 100 TB
    shape either way. Images/unknown pass through with nulls.
    """
    import zlib as _zlib

    from ..functions.media_codecs import wav_pcm_frames, y4m_frames

    def run(iterator):
        for pdf in iterator:
            n = len(pdf)
            fmt = [""] * n
            ns = np.full(n, np.nan)
            nsmp = np.full(n, np.nan)
            crc = np.full(n, np.nan)
            for i, payload in enumerate(pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                f = sniff_format(b)
                fmt[i] = f
                if f == "wav":
                    hdr = decode_wav_header(b)
                    pcm = wav_pcm_frames(b)
                    if hdr is None or pcm is None:
                        continue
                    _rate, ch, total = hdr
                    frame_bytes = ch * 2
                    # a truncated payload may carry fewer bytes than the
                    # header declares; sample what is actually there
                    total = min(total, len(pcm) // frame_bytes)
                    frames = np.frombuffer(
                        pcm[: total * frame_bytes], dtype=np.uint8
                    ).reshape(total, frame_bytes)
                    sampled = frames[::every_k]
                    ns[i] = total
                    nsmp[i] = len(sampled)
                    crc[i] = _zlib.crc32(sampled.tobytes())
                elif f == "y4m":
                    frames = y4m_frames(b)
                    if not frames:
                        continue
                    sampled = frames[::every_k]
                    ns[i] = len(frames)
                    nsmp[i] = len(sampled)
                    crc[i] = _zlib.crc32(b"".join(sampled))
                elif pdf["media_kind"].iloc[i] == "video" or f not in (
                    "png",
                    "jpeg",
                ):
                    if strict:
                        raise NotImplementedError(
                            "no frame codec for payload format of "
                            f"{pdf['media_ref'].iloc[i]!r} "
                            f"(kind={pdf['media_kind'].iloc[i]!r})"
                        )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "format": fmt,
                    "n_samples": pd.Series(ns, dtype="Int32"),
                    "n_sampled": pd.Series(nsmp, dtype="Int32"),
                    "sampled_crc32": pd.Series(crc, dtype="Int64"),
                }
            )

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
