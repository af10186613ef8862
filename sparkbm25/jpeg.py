"""Baseline JPEG codec with the standard library + numpy only.

Implements the public ITU-T T.81 / JFIF baseline process: 8-bit
samples, sequential DCT, Huffman entropy coding. No external imaging
library — the bit plumbing is stdlib `struct`, the math is numpy
(the DCT is an exact orthonormal 8x8 matrix product, vectorized over
all blocks of a scan). This extends the multimodal image kernel's
zero-dependency real-decode coverage (PNG via zlib) to the most
common interchange format.

Decoder (`parse_jpeg`): SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS walk,
Huffman tables and quantization tables are read FROM THE FILE (never
assumed), arbitrary sampling factors h,v in {1,2} (4:4:4, 4:2:2,
4:2:0), restart markers, 1- or 3-component scans. Progressive
(SOF2), arithmetic coding, and 12-bit precision raise ValueError —
the multimodal 'auto' gate falls back to the deterministic fake for
those, exactly like non-PNG/WAV/AVI payloads elsewhere.

Encoder (`encode_jpeg`): quality-scaled Annex-K quantization tables,
standard Huffman tables (emitted in DHT — any prefix-complete table
is spec-valid because the tables travel with the file), 4:4:4 or
4:2:0 subsampling, optional restart intervals; used by tests and
fixtures to exercise every decoder path without an external encoder.

Reference parity note: the reference delegates binary-document
handling to its store (es-translator never decodes media); this
module serves the SURVEY P8 / training-pipeline multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K — public spec constants)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 Huffman table specs: (bits per code length 1..16, values).
# The decoder never consults these — it builds tables from the DHT
# segments in the file — so they only shape OUR encoder's output.
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
     0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
     0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
     0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
     0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
     0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
     0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
     0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
     0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
     0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
     0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
     0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
     0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
     0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
     0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
     0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])

# orthonormal 8x8 DCT-II basis: forward F = D @ block @ D.T
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * \
            (np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0))


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-convention quality scaling of the Annex-K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64),
               rgb[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0)
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) plane, dims multiples of 8 -> (n_blocks, 8, 8) in
    raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _blocks_plane(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (blocks.reshape(h8 // 8, w8 // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h8, w8))


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:        # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Bit cursor over unstuffed entropy bytes (numpy unpackbits)."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self.bits.size:
            raise ValueError("JPEG entropy stream exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bits.size:
            raise ValueError("JPEG entropy stream exhausted")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length) for the encoder."""
    codes = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


_DEFAULT_HTABLES: dict | None = None


def _default_htables() -> dict:
    """Decoder forms of the Annex K tables (the same _DC/_AC arrays
    the encoder writes), used when a stream carries no DHT for a
    selector id in 0/1. Real-world MJPEG-in-AVI conventionally omits
    DHT — T.81 permits it, decoders must supply the typical tables
    (final-round review: every mainstream camera/ffmpeg MJPEG frame
    previously raised 'missing JPEG Huffman table'). Built lazily
    once; selector ids 2/3 without a DHT still raise."""
    global _DEFAULT_HTABLES
    if _DEFAULT_HTABLES is None:
        _DEFAULT_HTABLES = {
            (0, 0): _build_decode(*_DC_LUMA),
            (0, 1): _build_decode(*_DC_CHROMA),
            (1, 0): _build_decode(*_AC_LUMA),
            (1, 1): _build_decode(*_AC_CHROMA),
        }
    return _DEFAULT_HTABLES


def _build_decode(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> value for the decoder."""
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale uint8 as baseline
    JFIF. subsampling: '444' (no chroma subsampling) or '420'
    (2x2 chroma). restart_interval: MCUs between RST markers (0 =
    none). Tables (DQT + DHT) are embedded, so any spec-compliant
    decoder reads the output."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("encode_jpeg wants (H,W,3) RGB or (H,W) gray")
        ycc = _rgb_to_ycbcr(a)
        if subsampling == "444":
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            h, w = a.shape[:2]
            # box-average 2x2 chroma (pad odd dims by edge replication)
            he, we = h + (h & 1), w + (w & 1)
            cc = np.empty((he, we, 2))
            cc[:h, :w] = ycc[..., 1:]
            if h & 1:
                cc[h:] = cc[h - 1:h]
            if w & 1:
                cc[:, w:] = cc[:, w - 1:w]
            sub = cc.reshape(he // 2, 2, we // 2, 2, 2).mean(axis=(1, 3))
            planes = [ycc[..., 0], sub[..., 0], sub[..., 1]]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
    h, w = a.shape[:2]
    qluma, qchroma = _quality_tables(quality)
    qtabs = [qluma] if gray else [qluma, qchroma]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # per component: pad plane to the MCU grid, DCT+quantize all blocks
    comp_zz = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        ph = mcus_y * 8 * sv
        pw = mcus_x * 8 * sh
        padded = np.empty((ph, pw))
        ch, cw = plane.shape
        padded[:ch, :cw] = plane
        padded[ch:] = padded[ch - 1:ch]
        padded[:, cw:] = padded[:, cw - 1:cw]
        blocks = _plane_blocks(padded - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qtabs[min(ci, len(qtabs) - 1)].reshape(8, 8)
        quant = np.round(coef / q).astype(np.int64)
        comp_zz.append(quant.reshape(-1, 64)[:, ZIGZAG])

    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]

    writer = _BitWriter()
    preds = [0] * len(planes)
    blocks_per_row = [mcus_x * sh for sh, _ in samp]
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and \
                    mcu_index % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samp):
                tsel = min(ci, 1)
                dct, act = dc_codes[tsel], ac_codes[tsel]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * blocks_per_row[ci] + \
                            mx * sh + bx
                        zz = comp_zz[ci][bi]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s = _category(diff)
                        code, ln = dct[s]
                        writer.write(code, ln)
                        if s:
                            writer.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) \
                            if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act[0xF0]     # ZRL
                                writer.write(code, ln)
                                run -= 16
                            s = _category(v)
                            code, ln = act[(run << 4) | s]
                            writer.write(code, ln)
                            writer.write(
                                v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                            if k == last_nz:
                                break
                        if last_nz < 63:
                            code, ln = act[0x00]          # EOB
                            writer.write(code, ln)
            mcu_index += 1
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")                         # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtabs):
        out += seg(0xFFDB, bytes([ti]) + bytes(qt[ZIGZAG].tolist()))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, min(ci, len(qtabs) - 1)])
    out += seg(0xFFC0, sof)
    specs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        specs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, values) in specs:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(values))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = min(ci, 1)
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += writer.out
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def parse_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG to (H, W, 3) RGB (or (H, W, 1)
    for single-component scans) uint8. Tables come from the file's
    own DQT/DHT segments. Raises ValueError for anything that is not
    baseline sequential Huffman 8-bit (progressive, arithmetic,
    hierarchical, 12-bit) AND for any corrupt stream — a mutation
    fuzz pins that corrupted payloads terminate in ValueError, never
    a hang, an unbounded allocation, or a stray exception type."""
    try:
        return _parse_jpeg(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}") from e


def _parse_jpeg(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them or the seglen is read out of the
        # marker itself, desyncing the walk on spec-valid files
        # (final-round review, verified with a self-encoded stream)
        while pos + 4 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:                                # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:                                # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[b + 1:b + 65], dtype=np.uint8)
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = zz
                qtables[tq] = t
                b += 65
        elif marker == 0xC4:                              # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                values = list(body[b + 17:b + 17 + n])
                htables[(tc, th)] = _build_decode(bits, values)
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:            # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    # T.81 B.2.2: sampling factors are 1-4. A zero
                    # slipped past the old hmax-only check and reached
                    # the upsample divide as ZeroDivisionError,
                    # escaping the ValueError-only corruption contract
                    # (final-round review, one-byte-mutation repro)
                    raise ValueError("JPEG sampling factor out of range")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG process unsupported")
        elif marker == 0xDD:                              # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                              # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tsel = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"id": cs, "dc": tsel >> 4, "ac": tsel & 0x0F})
            break
        # APPn / COM / others: skipped via seglen
    if frame is None or scan is None:
        raise ValueError("JPEG without SOF0/SOS")

    # entropy data: unstuff 0xFF00, split at RST markers
    segments = []
    cur = bytearray()
    i = pos
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:                       # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                                          # EOI / next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    comps = frame["comps"]
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-INTERLEAVED — the
        # MCU is one data unit and blocks run in raster order over
        # ceil(w/8) x ceil(h/8); the declared sampling factors do not
        # tile (a grayscale file declaring 2x2 previously demanded
        # 4 blocks/MCU in tile order and rejected or scrambled valid
        # streams — final-round review). 1x1 reproduces exactly the
        # raster geometry, including per-data-unit restart counting.
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors beyond 2 unsupported")
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise ValueError("empty JPEG frame")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # allocation guard for corrupt SOF dims: every coded block costs
    # at least ~2 bits (a DC category code + an EOB), so a frame
    # whose block count exceeds 4x the byte length of the whole
    # payload cannot have been produced by a real encoder
    total_blocks = sum(mcus_x * c["h"] * mcus_y * c["v"] for c in comps)
    if total_blocks > max(len(payload) * 4, 1024):
        raise ValueError("JPEG frame size inconsistent with stream length")
    scan_of = {s["id"]: s for s in scan}
    for c in comps:
        if c["id"] not in scan_of:
            raise ValueError("component missing from scan")
        c["zz"] = np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64),
                           dtype=np.int64)

    reader = _BitReader(segments[0])
    seg_idx = 0
    preds = {c["id"]: 0 for c in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and \
                    mcu_index % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                reader = _BitReader(segments[seg_idx])
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                sel = scan_of[c["id"]]
                dct = (htables.get((0, sel["dc"]))
                       or _default_htables().get((0, sel["dc"])))
                act = (htables.get((1, sel["ac"]))
                       or _default_htables().get((1, sel["ac"])))
                if dct is None or act is None:
                    raise ValueError("missing JPEG Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _read_symbol(reader, dct)
                        diff = _receive_extend(reader, s)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:               # ZRL
                                    k += 16
                                    continue
                                break                      # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _receive_extend(reader, s)
                            k += 1
                        bi = (my * c["v"] + by) * (mcus_x * c["h"]) + \
                            mx * c["h"] + bx
                        c["zz"][bi] = zz
            mcu_index += 1

    # dequantize + inverse zigzag + IDCT, vectorized per component
    planes = []
    for c in comps:
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing JPEG quant table")
        coef = np.zeros_like(c["zz"], dtype=np.float64)
        coef[:, ZIGZAG] = c["zz"] * q[ZIGZAG]
        blocks = np.einsum("ji,njl,lk->nik", _DCT,
                           coef.reshape(-1, 8, 8), _DCT) + 128.0
        ph, pw = mcus_y * c["v"] * 8, mcus_x * c["h"] * 8
        plane = _blocks_plane(blocks, ph, pw)
        # crop to the component's true extent, upsample to full frame
        ch = -(-h * c["v"] // vmax)
        cw = -(-w * c["h"] // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)[:, :, None]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count: {len(planes)}")
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
