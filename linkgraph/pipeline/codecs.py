"""Pure-stdlib container codecs for the multimodal tier: PNG (zlib +
numpy per-row unfilter) and WAV (RIFF struct parse).

This container ships no imaging/audio libraries, but PNG and WAV need
none: PNG's only compression is DEFLATE (stdlib ``zlib``) plus five
per-row byte filters, and WAV PCM is a struct-described sample buffer.
Both directions are implemented so round-trip tests need no external
fixtures; MP4 stays honestly stubbed in multimodal.py (a real ISO-BMFF
/ H.264 stack is out of scope for stdlib).

Supported PNG subset (the overwhelmingly common case): 8-bit depth,
color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced.
All five filter types (None/Sub/Up/Average/Paeth) decode; the encoder
can emit any fixed filter type so tests exercise every unfilter path.

Supported WAV subset: RIFF/WAVE with a PCM ``fmt `` chunk (format 1),
16-bit samples, any channel count and sample rate; extra chunks (LIST,
fact, ...) are skipped per the RIFF contract.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS_OF_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE_OF_CHANNELS = {1: 0, 3: 2, 2: 4, 4: 6}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (H, W[, C]) array -> PNG bytes (8-bit, non-interlaced).

    ``filter_type`` applies one fixed filter to every scanline (0-4);
    non-zero values exist to exercise the decoder's unfilter paths in
    round-trip tests — 0 is the normal emit path.
    """
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in _COLOR_TYPE_OF_CHANNELS:
        raise ValueError(f"unsupported channel count {c}")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    bpp = c  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        row = a[y]
        if filter_type == 0:
            filt = row
        else:
            left = np.zeros_like(row)
            left[1:] = row[:-1]
            up = prev
            upleft = np.zeros_like(row)
            upleft[1:] = prev[:-1]
            r16 = row.astype(np.int16)
            if filter_type == 1:  # Sub
                filt = (r16 - left).astype(np.uint8)
            elif filter_type == 2:  # Up
                filt = (r16 - up).astype(np.uint8)
            elif filter_type == 3:  # Average
                filt = (r16 - (left.astype(np.int16) + up) // 2).astype(np.uint8)
            else:  # Paeth
                filt = (r16 - _paeth(left, up, upleft)).astype(np.uint8)
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE_OF_CHANNELS[c], 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (int16 in/out)."""
    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = upleft.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.int16)


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (H, W, C) array.

    Real decoder for the 8-bit non-interlaced subset: chunk walk with
    CRC validation, zlib inflate, then per-row unfilter — Sub/Average/
    Paeth reconstruct left-to-right (the spec's sequential dependency),
    with the per-row arithmetic in numpy.
    """
    if payload[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if color_type not in _CHANNELS_OF_COLOR_TYPE:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if comp != 0 or filt_method != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    c = _CHANNELS_OF_COLOR_TYPE[color_type]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG data length mismatch: {len(raw)} != {h}*(1+{stride})"
        )
    out = np.zeros((h, w, c), dtype=np.uint8)
    prev = np.zeros((w, c), dtype=np.int16)
    bpp = c
    for y in range(h):
        line = raw[y * (1 + stride) : (y + 1) * (1 + stride)]
        ftype = line[0]
        filt = np.frombuffer(line[1:], dtype=np.uint8).reshape(w, c).astype(np.int16)
        if ftype == 0:
            recon = filt
        elif ftype == 1:  # Sub: sequential left dependency
            recon = filt.copy()
            for x in range(1, w):
                recon[x] = (recon[x] + recon[x - 1]) & 0xFF
        elif ftype == 2:  # Up: fully vectorized
            recon = (filt + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = filt.copy()
            recon[0] = (recon[0] + prev[0] // 2) & 0xFF
            for x in range(1, w):
                recon[x] = (recon[x] + (recon[x - 1] + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            recon = filt.copy()
            zero = np.zeros(c, dtype=np.int16)
            for x in range(w):
                left = recon[x - 1] if x else zero
                upleft = prev[x - 1] if x else zero
                recon[x] = (recon[x] + _paeth(left, prev[x], upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} in row {y}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out


WAV_RIFF = b"RIFF"
WAV_WAVE = b"WAVE"


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, channels: int | None = None
) -> bytes:
    """int16 array of shape (n,) or (n, channels) -> WAV (PCM16) bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if channels is not None and channels != ch:
        raise ValueError(f"channels={channels} but samples have {ch}")
    data = s.tobytes()  # interleaved little-endian frames
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, 16
    )
    body = (
        WAV_WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return WAV_RIFF + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, sample_rate); mono returns shape
    (n,), multi-channel (n, channels). Skips non-fmt/data chunks."""
    if payload[:4] != WAV_RIFF or payload[8:12] != WAV_WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (16 only)")
    if len(data) % (2 * ch):
        raise ValueError("WAV data length not a whole number of frames")
    s = np.frombuffer(data, dtype="<i2").astype(np.int16).reshape(-1, ch)
    return (s[:, 0] if ch == 1 else s), rate
