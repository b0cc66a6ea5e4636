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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81) grayscale codec — real DCT + Huffman, numpy +
# stdlib only. The byte stream is fully self-describing (tables travel in
# DQT/DHT segments), so the decoder is a genuine baseline-grayscale decoder,
# not a mirror of the encoder's constants.
# ---------------------------------------------------------------------------

# Annex K.1 luminance quantization table (zigzag-independent, row-major)
_JPEG_QBASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
# Annex K.3 / K.5 luminance Huffman specs: (BITS counts for lengths 1..16,
# HUFFVAL symbol list)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag() -> list[int]:
    """Row-major index for each zigzag position (spec figure 5)."""
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            order.append(r * 8 + (s - r))
    return order


_ZIGZAG = _zigzag()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (spec Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    m = np.sqrt(2.0 / 8.0) * np.cos((2 * x + 1) * x.reshape(-1, 1) * np.pi / 16)
    m[0, :] = 1.0 / np.sqrt(8.0)
    return m


def _scaled_qtable(quality: int):
    import numpy as np

    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (np.array(_JPEG_QBASE, dtype=np.int64) * scale + 50) // 100
    return np.clip(qt, 1, 255).reshape(8, 8)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (spec F.1.2.3)
                self.buf.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


def _jpeg_seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


def encode_gray_jpeg(
    pixels: bytes, width: int, height: int, quality: int = 90
) -> bytes:
    """REAL baseline-DCT JPEG encode of row-major 8-bit grayscale pixels:
    level shift, 8x8 forward DCT (vectorized), quantization (Annex K table
    scaled by ``quality``), zigzag, DC-differential + AC run-length Huffman
    coding with the Annex K luminance tables, 0xFF byte stuffing."""
    import numpy as np

    qt = _scaled_qtable(quality)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.pad(
        arr.astype(np.float64) - 128.0,
        ((0, bh * 8 - height), (0, bw * 8 - width)),
        mode="edge",
    )
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    m = _dct_matrix()
    coeffs = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    quant = np.round(coeffs / qt).astype(np.int32).reshape(-1, 64)
    zz = quant[:, _ZIGZAG]

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _BitWriter()
    pred = 0
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        size = abs(diff).bit_length()
        code, length = dc_codes[size]
        w.write(code, length)
        if size:
            w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                w.write(code, length)
                run -= 16
            size = abs(v).bit_length()
            code, length = ac_codes[(run << 4) | size]
            w.write(code, length)
            w.write(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            w.write(code, length)
    scan = w.flush()

    app0 = (
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    dqt = bytes([0x00]) + bytes(
        int(qt.reshape(-1)[_ZIGZAG[i]]) for i in range(64)
    )
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    sos_hdr = bytes([1, 1, 0x00]) + bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + _jpeg_seg(0xE0, app0)
        + _jpeg_seg(0xDB, dqt)
        + _jpeg_seg(0xC0, sof0)
        + _jpeg_seg(0xC4, dht_dc)
        + _jpeg_seg(0xC4, dht_ac)
        + _jpeg_seg(0xDA, sos_hdr)
        + scan
        + b"\xff\xd9"
    )


def encode_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """A REAL baseline JPEG with deterministic grayscale pixel content —
    smooth 2-D gradient plus a seed-phased wave, so quantization error
    stays small and the decode roundtrip is testable."""
    import numpy as np

    y, x = np.mgrid[0:height, 0:width]
    vals = (
        96.0
        + 60.0 * np.sin((x + (seed & 63)) / 11.0)
        + 50.0 * np.cos((y + ((seed >> 6) & 63)) / 13.0)
    )
    pixels = np.clip(vals, 0, 255).astype(np.uint8).tobytes()
    return encode_gray_jpeg(pixels, width, height)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise EOFError
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(payload: bytes) -> bytes | None:
    """REAL baseline-DCT decode for single-component (grayscale) JPEGs:
    parses DQT/SOF0/DHT/SOS from the stream (self-describing — no encoder
    constants reused), Huffman-decodes the entropy scan, dequantizes,
    inverse-DCTs (vectorized), and crops padding. Returns row-major 8-bit
    pixels, or None for anything this decoder doesn't cover (progressive,
    multi-component, restart intervals)."""
    import numpy as np

    if payload is None or len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comp_q = 0
    dc_id = ac_id = 0
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        if payload[pos + 1] == 0xFF:
            # T.81 B.1.1.2: a marker may be preceded by any number of
            # 0xFF fill bytes — skip them instead of misparsing the fill
            # byte as a marker with a length prefix (round-6 advice)
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) < length - 2:
            return None  # truncated segment
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    return None  # 16-bit tables: out of baseline scope
                vals = np.zeros(64, dtype=np.int32)
                vals[_ZIGZAG] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                )
                qtables[tid] = vals.reshape(8, 8)
                b += 65
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                return None
            comp_q = body[8]
        elif marker == 0xC2:  # progressive: not supported
            return None
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nvals = sum(bits)
                vals = list(body[b + 17 : b + 17 + nvals])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                htables[(cls, tid)] = table
                b += 17 + nvals
        elif marker == 0xDD:  # DRI restart interval: not supported
            return None
        elif marker == 0xDA:  # SOS
            if body[0] != 1:
                return None
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if scan_start is None or width is None:
        return None
    qt = qtables.get(comp_q)
    dc_tab = htables.get((0, dc_id))
    ac_tab = htables.get((1, ac_id))
    if qt is None or dc_tab is None or ac_tab is None:
        return None

    # entropy data: strip stuffing, stop at the next real marker
    raw = bytearray()
    p = scan_start
    while p < len(payload):
        byte = payload[p]
        if byte == 0xFF:
            nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                raw.append(0xFF)
                p += 2
                continue
            break
        raw.append(byte)
        p += 1

    bw, bh = (width + 7) // 8, (height + 7) // 8
    n_blocks = bw * bh
    zz = np.zeros((n_blocks, 64), dtype=np.int32)
    reader = _BitReader(bytes(raw))
    pred = 0
    try:
        for n in range(n_blocks):
            size = _huff_decode(reader, dc_tab)
            pred += _extend(reader.read(size), size)
            zz[n, 0] = pred
            k = 1
            while k < 64:
                rs = _huff_decode(reader, ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                size = rs & 0x0F
                if k > 63:
                    return None
                zz[n, k] = _extend(reader.read(size), size)
                k += 1
    except (EOFError, ValueError):
        return None

    quant = np.zeros((n_blocks, 64), dtype=np.int32)
    quant[:, _ZIGZAG] = zz
    coeffs = quant.reshape(-1, 8, 8) * qt
    m = _dct_matrix()
    blocks = np.einsum("xu,nuv,yv->nxy", m.T, coeffs, m.T)
    full = (
        blocks.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    out = np.clip(np.round(full + 128.0), 0, 255).astype(np.uint8)
    return out[:height, :width].tobytes()


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
    if payload[:10] == Y4M_MAGIC:
        return "y4m"
    return "unknown"


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video container — uncompressed, FRAME-delimited planes,
# fully parseable with the stdlib. Cmono (one 8-bit Y plane per frame) keeps
# frames grayscale like the PNG/JPEG paths; C420 layouts are also decoded.
# ---------------------------------------------------------------------------
Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(
    width: int, height: int, n_frames: int, fps: int = 25, seed: int = 0
) -> bytes:
    """A valid YUV4MPEG2 stream (Cmono) with deterministic frame data."""
    import numpy as np

    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 Cmono\n".encode()
    )
    idx = np.arange(width * height, dtype=np.int64)
    parts = [header]
    for f in range(n_frames):
        plane = ((seed + f * 7 + idx * 31) & 0xFF).astype(np.uint8)
        parts.append(b"FRAME\n" + plane.tobytes())
    return b"".join(parts)


def _y4m_params(payload: bytes) -> tuple[dict, int] | None:
    """Parse the stream header line -> ({W,H,F,C,...}, offset past \\n)."""
    if payload is None or payload[:10] != Y4M_MAGIC:
        return None
    nl = payload.find(b"\n", 10)
    if nl < 0:
        return None
    params: dict[str, str] = {}
    for tok in payload[10:nl].split(b" "):
        if tok:
            params[chr(tok[0])] = tok[1:].decode("ascii", "replace")
    return params, nl + 1


def _y4m_frame_bytes(width: int, height: int, colorspace: str) -> int | None:
    if colorspace.startswith("mono"):
        return width * height
    if colorspace.startswith("420"):
        return width * height + 2 * ((width // 2) * (height // 2))
    if colorspace.startswith("422"):
        return width * height + 2 * ((width // 2) * height)
    if colorspace.startswith("444"):
        return 3 * width * height
    return None


def decode_y4m_header(
    payload: bytes,
) -> tuple[int, int, int, int] | None:
    """(width, height, fps_num, n_frames); frame count comes from walking
    the FRAME markers, not trusting any declared value. None if not Y4M."""
    parsed = _y4m_params(payload)
    if parsed is None:
        return None
    params, pos = parsed
    try:
        width, height = int(params["W"]), int(params["H"])
        fps_num = int(params.get("F", "25:1").split(":")[0])
    except (KeyError, ValueError):
        return None
    fb = _y4m_frame_bytes(width, height, params.get("C", "420jpeg"))
    if fb is None:
        return None
    n_frames = 0
    while payload[pos : pos + 5] == b"FRAME":
        nl = payload.find(b"\n", pos)
        if nl < 0:
            break
        if nl + 1 + fb > len(payload):
            break  # truncated final frame: don't count it
        n_frames += 1
        pos = nl + 1 + fb
    return width, height, fps_num, n_frames


def y4m_frames(payload: bytes) -> list[bytes] | None:
    """Raw plane bytes of each complete frame, or None if not Y4M."""
    parsed = _y4m_params(payload)
    if parsed is None:
        return None
    params, pos = parsed
    try:
        width, height = int(params["W"]), int(params["H"])
    except (KeyError, ValueError):
        return None
    fb = _y4m_frame_bytes(width, height, params.get("C", "420jpeg"))
    if fb is None:
        return None
    frames = []
    while payload[pos : pos + 5] == b"FRAME":
        nl = payload.find(b"\n", pos)
        if nl < 0 or nl + 1 + fb > len(payload):
            break
        frames.append(payload[nl + 1 : nl + 1 + fb])
        pos = nl + 1 + fb
    return frames


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
