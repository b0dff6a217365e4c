"""Pure-Python GIF codec — real palette-image decode without PIL.

GIF87a/89a is a public spec (CompuServe 1989/1990) whose only compression
is LZW, fully specified in the spec's appendix — so, like PNG (zlib),
JPEG (T.81) and WAV (RIFF), a real decode path needs no native library:

- ``gif_to_pixels``: decodes the FIRST image of a GIF87a/89a stream to an
  (H,W,3) uint8 RGB array — logical screen descriptor, global/local color
  tables, sub-block defragmentation, variable-width LZW with code-size
  growth and CLEAR/EOI handling, interlaced row ordering (the four-pass
  scheme), extension-block skipping. Malformed streams raise ValueError.
- ``pixels_to_gif``: encodes an (H,W) palette-index array + palette as a
  standards-valid non-interlaced GIF89a (real LZW compression with
  dictionary growth and 12-bit cap reset).

Animation is out of scope (first frame only — the reference treats images
as stills, image_processor.py:159-183).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _LZWWriter:
    """Little-endian LSB-first bit packer (GIF convention)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LZWWriter()
    width = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    w.write(clear, width)
    prefix: Tuple[int, ...] = ()
    for px in indices.ravel().tolist():
        cand = prefix + (px,)
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= (1 << 12):
            w.write(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (px,)
    if prefix:
        w.write(table[prefix], width)
    w.write(eoi, width)
    return w.flush()


def pixels_to_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(H,W) uint8 palette indices + (n,3) uint8 palette -> GIF89a bytes."""
    idx = np.asarray(indices)
    pal = np.asarray(palette)
    if idx.ndim != 2 or idx.dtype != np.uint8:
        raise ValueError("indices must be a (H,W) uint8 array")
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3)")
    n_colors = len(pal)
    if n_colors < 2 or n_colors > 256 or int(idx.max(initial=0)) >= n_colors:
        raise ValueError("palette size out of range or index out of palette")
    depth = max(1, (n_colors - 1).bit_length())
    table_size = 1 << depth
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT present, depth
    gct = np.zeros((table_size, 3), np.uint8)
    gct[:n_colors] = pal
    out += gct.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    min_code = max(2, depth)
    out += bytes([min_code])
    data = _lzw_compress(idx, min_code)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _LZWReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LZWReader(data)
    width = min_code_size + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: Optional[bytes] = None
    while len(out) < n_pixels:
        code = r.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # width grows when the NEXT code would not fit
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended before image was complete")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF four-pass interlace: rows arrive as passes (0,8,16..),(4,12..),
    (2,6,10..),(1,3,5..) — reorder into natural top-to-bottom."""
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_to_pixels(payload: bytes) -> np.ndarray:
    """GIF bytes -> (H,W,3) uint8 RGB of the first image. Malformed input
    raises ValueError (truncation shows up as IndexError internally —
    normalized here so decode UDFs can isolate per row on one type)."""
    try:
        return _gif_to_pixels(payload)
    except IndexError as ex:
        raise ValueError(f"truncated GIF: {ex}") from ex


def _gif_to_pixels(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        size = 1 << ((flags & 0x07) + 1)
        gct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
            iflags = payload[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:  # local color table
                size = 1 << ((iflags & 0x07) + 1)
                table = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(
                    size, 3
                )
                pos += size * 3
            if table is None:
                raise ValueError("no color table for image")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < n and payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if min_code < 2 or min_code > 11:
                raise ValueError(f"bad LZW minimum code size {min_code}")
            idx = _lzw_decompress(bytes(lzw), min_code, iw * ih).reshape(ih, iw)
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("pixel index outside color table")
            if iflags & 0x40:
                idx = _deinterlace(idx)
            # first image only; its size may differ from the logical screen
            return table[idx]
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    raise ValueError("no image data in GIF")
