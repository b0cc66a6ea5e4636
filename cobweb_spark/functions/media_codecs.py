"""Pure-Python (stdlib-only) media codecs: PNG and WAV.

The reference carries binary bodies opaquely (Base64 in the content hash,
``lib/cobweb.rb:232``); our engine decodes them. No codec libraries exist
in this container, but PNG headers/chunks and RIFF/WAVE headers need none —
encode and decode are a few dozen lines of struct packing over zlib.

Used three ways:
* fixtures generate REAL payload bytes (valid PNG/WAV files) with known
  metadata stored beside them,
* ``operators.multimodal.decode_media`` parses the bytes back inside an
  Arrow-batched ``mapInPandas``,
* the DuckDB oracle reads the stored metadata — decode output vs generator
  metadata is a genuine cross-check of the decoder.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """A minimal valid 8-bit grayscale PNG with deterministic pixel data."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    # scanlines: filter byte 0 + deterministic pixels
    raster = bytearray()
    for y in range(height):
        raster.append(0)
        for x in range(width):
            raster.append((seed + x * 31 + y * 17) & 0xFF)
    idat = zlib.compress(bytes(raster), 6)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png_header(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk; None if not a PNG."""
    if payload is None or len(payload) < 24:
        return None
    if payload[:8] != PNG_SIGNATURE or payload[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", payload[16:24])
    return width, height


def decode_png_pixels(payload: bytes) -> bytes | None:
    """Full decode of the grayscale-no-filter PNGs ``encode_png`` emits:
    inflate IDAT, strip the per-scanline filter byte. Returns raw pixels
    (row-major) or None if the file isn't such a PNG."""
    hdr = decode_png_header(payload)
    if hdr is None:
        return None
    width, height = hdr
    pos, idat = 8, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raster = zlib.decompress(bytes(idat))
    stride = width + 1
    out = bytearray()
    for y in range(height):
        row = raster[y * stride : (y + 1) * stride]
        if not row or row[0] != 0:
            return None  # only filter-0 scanlines supported
        out += row[1:]
    return bytes(out)


def encode_wav(
    n_samples: int, sample_rate: int, n_channels: int = 1, seed: int = 0
) -> bytes:
    """A minimal valid PCM16 WAV with deterministic sample data."""
    frames = bytearray()
    for i in range(n_samples * n_channels):
        v = ((seed + i * 2654435761) & 0xFFFF) - 0x8000
        frames += struct.pack("<h", v)
    data = bytes(frames)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_header(
    payload: bytes,
) -> tuple[int, int, int] | None:
    """(sample_rate, n_channels, n_samples) from RIFF/fmt/data chunks;
    None if not a PCM WAV."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    sample_rate = n_channels = block_align = None
    n_samples = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"fmt " and length >= 16:
            _fmt, n_channels, sample_rate, _br, block_align, _bits = (
                struct.unpack("<HHIIHH", payload[pos + 8 : pos + 24])
            )
        elif tag == b"data" and block_align:
            n_samples = length // block_align
        pos += 8 + length + (length & 1)
    if sample_rate is None or n_samples is None:
        return None
    return sample_rate, n_channels, n_samples


def encode_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """A structurally valid baseline JPEG (JFIF) byte stream with the
    given dimensions in its SOF0 frame header.

    Marker sequence is real (SOI, APP0/JFIF, DQT, SOF0, DHT, SOS, EOI)
    and every segment length is correct, so any conforming header parser
    reads the right dimensions; the entropy-coded scan data is
    deterministic filler (0xFF bytes excluded, as the format requires
    un-escaped) rather than a true DCT+Huffman encoding — this container
    has no JPEG codec library, and the engine's decode surface for JPEG
    is the header (see ``decode_jpeg_header``)."""

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = bytes([0]) + bytes((i * 3 + 1) % 255 + 1 for i in range(64))
    # SOF0: precision 8, height, width, 1 component (grayscale)
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    # minimal DC Huffman table: 16 zero counts + no symbols won't parse in
    # real decoders; use one symbol of each of two lengths
    dht = bytes([0x00]) + bytes([0, 1, 1] + [0] * 13) + bytes([0, 1])
    sos_hdr = bytes([1, 1, 0x00]) + bytes([0, 63, 0])
    scan = bytes(((seed + i * 131) & 0xFF) or 0x55 for i in range(64))
    scan = scan.replace(b"\xff", b"\xfe")
    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC0, sof0)
        + seg(0xC4, dht)
        + seg(0xDA, sos_hdr)
        + scan
        + b"\xff\xd9"
    )


def decode_jpeg_header(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOF0/SOF1/SOF2 frame header —
    scan the marker stream from SOI; None if not a JPEG or no SOF
    before the scan data."""
    if payload is None or len(payload) < 4:
        return None
    if payload[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0 baseline / ext / progressive
            if pos + 9 > len(payload):
                return None
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return width, height
        if marker == 0xDA:  # scan data starts — no SOF seen
            return None
        pos += 2 + length
    return None


def sniff_format(payload: bytes) -> str:
    """Magic-byte format sniff — a real decoder never trusts the file
    extension."""
    if payload is None:
        return "unknown"
    if payload[:8] == PNG_SIGNATURE:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


def encode_gray_png(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw row-major 8-bit grayscale pixels as a valid PNG
    (filter-0 scanlines) — the inverse of ``decode_png_pixels``."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raster = bytearray()
    for y in range(height):
        raster.append(0)
        raster += pixels[y * width : (y + 1) * width]
    idat = zlib.compress(bytes(raster), 6)
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def fit_dims(width: int, height: int, max_dim: int) -> tuple[int, int]:
    """Target dimensions fitting ``max_dim`` with aspect preserved —
    pure integer arithmetic (floor), so the DuckDB oracle reproduces it:
    unchanged when it already fits, else scaled by max_dim/longest side,
    floored, clamped to >= 1."""
    longest = max(width, height)
    if longest <= max_dim:
        return width, height
    return (
        max(1, (width * max_dim) // longest),
        max(1, (height * max_dim) // longest),
    )


def resize_gray_nn(
    pixels: bytes, width: int, height: int, new_w: int, new_h: int
) -> bytes:
    """Deterministic nearest-neighbor resample of raw grayscale pixels:
    source index = (dst * src_len) // dst_len per axis."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return arr[np.ix_(ys, xs)].tobytes()


def wav_pcm_frames(payload: bytes) -> bytes | None:
    """Raw PCM bytes of the data chunk, or None if not a PCM WAV."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"data":
            return payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
    return None
