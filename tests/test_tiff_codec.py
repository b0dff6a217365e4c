"""Baseline TIFF codec (multimodal/tiff_codec.py): roundtrips across
byte orders / strips / PackBits / photometrics, hand-assembled external
fixtures (spec IFD byte layout), and the ValueError-only contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docling_japanese_books_spark.multimodal.tiff_codec import (
    packbits_decode,
    packbits_encode,
    pixels_to_tiff,
    tiff_to_pixels,
)


def _grad(h, w, seed=0):
    x, y = np.arange(w), np.arange(h)
    return ((x[None, :] * 7 + y[:, None] * 13 + seed) % 256).astype(np.uint8)


def test_gray_roundtrip_both_byte_orders():
    px = _grad(13, 21, 5)
    for bo in ("<", ">"):
        back = tiff_to_pixels(pixels_to_tiff(px, byte_order=bo))
        assert back.shape == (13, 21) and (back == px).all(), bo


def test_rgb_roundtrip_multistrip():
    px = np.dstack([_grad(16, 9, s) for s in (0, 50, 100)])
    for rps in (1, 3, 16):
        back = tiff_to_pixels(pixels_to_tiff(px, rows_per_strip=rps))
        assert back.shape == (16, 9, 3) and (back == px).all(), rps


def test_packbits_roundtrip_and_compression():
    # long constant runs compress well and must roundtrip exactly
    px = np.repeat(np.arange(8, dtype=np.uint8) * 32, 40).reshape(8, 40)
    data = pixels_to_tiff(px, compression=32773, rows_per_strip=2)
    assert len(data) < px.size  # PackBits actually compressed the runs
    assert (tiff_to_pixels(data) == px).all()
    # adversarial mixed content through the raw encoder
    for blob in (b"", b"a", b"abc", b"aaab", b"ab" * 64, bytes(range(256)) * 3):
        assert packbits_decode(packbits_encode(blob)) == blob


def test_packbits_spec_examples():
    """The worked example from the TIFF 6.0 spec, §9."""
    encoded = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00,
         0x2A, 0x22, 0xF7, 0xAA]
    )
    expected = (
        b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert packbits_decode(encoded) == expected


def _ifd_entry(bo, tag, typ, count, value):
    return struct.pack(bo + "HHI", tag, typ, count) + value


def test_external_hand_assembled_gray_tiff():
    """A 2x2 grayscale TIFF laid out byte-by-byte from the spec: header,
    pixel strip at offset 8, IFD at 12 — our writer never produced these
    bytes (different layout), so the decoder is checked independently."""
    bo = "<"
    pixels = bytes([10, 200, 30, 255])
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack("<HH", 2, 0)),   # width
        _ifd_entry(bo, 257, 3, 1, struct.pack("<HH", 2, 0)),   # height
        _ifd_entry(bo, 258, 3, 1, struct.pack("<HH", 8, 0)),   # bits
        _ifd_entry(bo, 259, 3, 1, struct.pack("<HH", 1, 0)),   # no compression
        _ifd_entry(bo, 262, 3, 1, struct.pack("<HH", 1, 0)),   # BlackIsZero
        _ifd_entry(bo, 273, 4, 1, struct.pack("<I", 8)),       # strip at 8
        _ifd_entry(bo, 277, 3, 1, struct.pack("<HH", 1, 0)),   # 1 sample
        _ifd_entry(bo, 278, 3, 1, struct.pack("<HH", 2, 0)),   # rows/strip
        _ifd_entry(bo, 279, 4, 1, struct.pack("<I", 4)),       # strip bytes
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 12) + pixels + ifd
    out = tiff_to_pixels(blob)
    assert out.tolist() == [[10, 200], [30, 255]]


def test_external_big_endian_white_is_zero():
    """Big-endian + WhiteIsZero: a fax-style inverted grayscale, all
    fields MM-packed by hand."""
    bo = ">"
    pixels = bytes([0, 255, 128, 64])
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack(">HH", 2, 0)),
        _ifd_entry(bo, 257, 3, 1, struct.pack(">HH", 2, 0)),
        _ifd_entry(bo, 258, 3, 1, struct.pack(">HH", 8, 0)),
        _ifd_entry(bo, 259, 3, 1, struct.pack(">HH", 1, 0)),
        _ifd_entry(bo, 262, 3, 1, struct.pack(">HH", 0, 0)),  # WhiteIsZero
        _ifd_entry(bo, 273, 4, 1, struct.pack(">I", 8)),
        _ifd_entry(bo, 277, 3, 1, struct.pack(">HH", 1, 0)),
        _ifd_entry(bo, 278, 3, 1, struct.pack(">HH", 2, 0)),
        _ifd_entry(bo, 279, 4, 1, struct.pack(">I", 4)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    blob = b"MM\x00*" + struct.pack(">I", 12) + pixels + ifd
    out = tiff_to_pixels(blob)
    assert out.tolist() == [[255, 0], [127, 191]]  # inverted


def test_palette_tiff():
    """Photometric 3: indices map through a 16-bit ColorMap (>>8)."""
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    # build via the writer layout, then patch photometric + append a map?
    # simpler: hand-build with the colormap stored after the IFD
    bo = "<"
    cmap_vals = [0] * 768
    cmap_vals[0], cmap_vals[1], cmap_vals[2] = 0x1000, 0x8000, 0xFF00  # reds
    cmap_vals[256], cmap_vals[257] = 0x2000, 0x4000                     # greens
    cmap_vals[512 + 2] = 0xFF00                                         # blues
    pixels = idx.tobytes()
    ifd_off = 8 + len(pixels)
    cmap_off = ifd_off + 2 + 10 * 12 + 4
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 257, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 258, 3, 1, struct.pack("<HH", 8, 0)),
        _ifd_entry(bo, 259, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 262, 3, 1, struct.pack("<HH", 3, 0)),  # palette
        _ifd_entry(bo, 273, 4, 1, struct.pack("<I", 8)),
        _ifd_entry(bo, 277, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 278, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 279, 4, 1, struct.pack("<I", len(pixels))),
        _ifd_entry(bo, 320, 3, 768, struct.pack("<I", cmap_off)),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    blob = (
        b"II*\x00" + struct.pack("<I", ifd_off) + pixels + ifd
        + struct.pack("<768H", *cmap_vals)
    )
    out = tiff_to_pixels(blob)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [0x10, 0x20, 0x00]
    assert out[0, 1].tolist() == [0x80, 0x40, 0x00]
    assert out[1, 0].tolist() == [0xFF, 0x00, 0xFF]


def test_valueerror_contract():
    px = _grad(4, 4)
    good = pixels_to_tiff(px)
    for bad in (
        b"",
        b"II*\x00",                         # header only
        b"XX*\x00" + good[4:],              # bad magic
        good[:20],                           # truncated IFD
        good[:-6] + struct.pack("<IH", 99999, 0),  # strip offset OOB-ish
    ):
        with pytest.raises(ValueError):
            tiff_to_pixels(bad)
    # unsupported compression id (7 = new-style JPEG, out of subset;
    # 5/LZW became supported in round 6)
    t = pixels_to_tiff(px)
    idx = t.find(struct.pack("<HHI", 259, 3, 1))
    bad = t[: idx + 8] + struct.pack("<HH", 7, 0) + t[idx + 12 :]
    with pytest.raises(ValueError, match="compression"):
        tiff_to_pixels(bad)
    # LZW-tagged but uncompressed payload must fail as a bad stream,
    # never escape with a non-ValueError
    bad_lzw = t[: idx + 8] + struct.pack("<HH", 5, 0) + t[idx + 12 :]
    with pytest.raises(ValueError):
        tiff_to_pixels(bad_lzw)


def test_decode_image_real_dispatches_tiff():
    from docling_japanese_books_spark.multimodal.images import decode_image_real

    px = _grad(10, 12, 3)
    meta = decode_image_real(pixels_to_tiff(px, byte_order=">"))
    assert meta["format"] == "tiff"
    assert (meta["width"], meta["height"]) == (12, 10)
    assert meta["feature"] is not None


def test_lzw_hand_derived_spec_vector():
    """TIFF 6.0 §13 worked by hand for input 07 07 07 07 07: the encoder
    must emit exactly Clear(256), 7, 258, 258, EOI(257) as 9-bit codes
    packed MSB-first, and the decoder must invert the same bytes. Pins
    the bit order and code numbering against the spec, independent of
    the writer/decoder pair's self-consistency."""
    from docling_japanese_books_spark.multimodal.tiff_codec import (
        lzw_decode,
        lzw_encode,
    )

    bits = "100000000" + "000000111" + "100000010" + "100000010" + "100000001"
    bits += "0" * (-len(bits) % 8)
    vec = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert lzw_encode(b"\x07" * 5) == vec
    assert lzw_decode(vec, expected=5) == b"\x07" * 5


def test_lzw_roundtrip_across_width_changes_and_reset():
    """Low-entropy payloads sized to push the code table through the
    EARLY width changes (511/1023/2047) and past the 4094 reset; plus a
    high-entropy payload (all literals, worst case)."""
    from docling_japanese_books_spark.multimodal.tiff_codec import (
        lzw_decode,
        lzw_encode,
    )

    rng = np.random.RandomState(7)
    for size in (1, 10, 1000, 20_000, 300_000):
        data = bytes(rng.randint(0, 8, size=size, dtype=np.uint8))
        assert lzw_decode(lzw_encode(data), expected=size) == data
    data = bytes(rng.randint(0, 256, size=100_000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data), expected=len(data)) == data


def test_lzw_tiff_roundtrip_with_predictor():
    """Compression 5 + Predictor 2 through the full TIFF container, gray
    and RGB, both byte orders, multi-strip; the predictor must make a
    smooth gradient dramatically smaller (differencing feeds LZW runs)."""
    rng = np.random.RandomState(11)
    for shape in ((13, 17), (9, 11, 3)):
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for pred in (1, 2):
            for bo in ("<", ">"):
                t = pixels_to_tiff(
                    px, compression=5, byte_order=bo,
                    rows_per_strip=4, predictor=pred,
                )
                assert np.array_equal(tiff_to_pixels(t), px)
    grad = np.tile(np.arange(256, dtype=np.uint8), (32, 1))
    t_pred = pixels_to_tiff(grad, compression=5, predictor=2)
    t_flat = pixels_to_tiff(grad, compression=5)
    assert np.array_equal(tiff_to_pixels(t_pred), grad)
    assert len(t_pred) < len(t_flat) // 3


def test_lzw_truncation_and_garbage_are_valueerror():
    from docling_japanese_books_spark.multimodal.tiff_codec import (
        lzw_decode,
        lzw_encode,
    )

    data = bytes(range(256)) * 4
    enc = lzw_encode(data)
    # cutting the FINAL byte only drops EOI/padding, which the decoder
    # tolerates when the payload is already complete (writers that omit
    # EOI exist) — so truncation tests cut where payload is lost
    assert lzw_decode(enc[:-1], expected=len(data)) == data
    for cut in (1, len(enc) // 2):
        with pytest.raises(ValueError):
            lzw_decode(enc[:cut], expected=len(data))
    with pytest.raises(ValueError):
        lzw_decode(b"\xff" * 40, expected=10)


def test_tiled_tiff_roundtrip_matrix():
    """§15 tiled layout through the writer/decoder pair: every
    compression x predictor x tile-grid x byte order, edge tiles
    clipped correctly (image not a multiple of the tile size)."""
    rng = np.random.RandomState(3)
    for shape in ((13, 17), (9, 11, 3)):
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for comp in (1, 5, 32773):
            for pred in (1, 2):
                for ts in ((8, 8), (16, 4)):
                    for bo in ("<", ">"):
                        t = pixels_to_tiff(
                            px, compression=comp, byte_order=bo,
                            predictor=pred, tile_size=ts,
                        )
                        back = tiff_to_pixels(t)
                        assert np.array_equal(back, px), (shape, comp, pred, ts, bo)


def test_external_hand_assembled_tiled_tiff():
    """A 3x3 gray image in 2x2 tiles laid out byte-by-byte from the §15
    spec (4 padded tiles, row-major, junk in the pad bytes) — bytes our
    writer never produces, so the tile clipping path is checked
    independently."""
    bo = "<"
    # image: [[1,2,3],[4,5,6],[7,8,9]]; tiles 2x2 -> grid 2x2, padded
    tiles = [
        bytes([1, 2, 4, 5]),          # top-left (full)
        bytes([3, 99, 6, 99]),        # top-right (right col = pad junk)
        bytes([7, 8, 99, 99]),        # bottom-left (bottom row = pad)
        bytes([9, 99, 99, 99]),       # bottom-right (3 pads)
    ]
    tile_data = b"".join(tiles)
    offsets = []
    pos = 8
    for t in tiles:
        offsets.append(pos)
        pos += len(t)
    ifd_off = pos
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack("<HH", 3, 0)),   # width
        _ifd_entry(bo, 257, 3, 1, struct.pack("<HH", 3, 0)),   # height
        _ifd_entry(bo, 258, 3, 1, struct.pack("<HH", 8, 0)),
        _ifd_entry(bo, 259, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 262, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 277, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 322, 3, 1, struct.pack("<HH", 2, 0)),   # TileWidth
        _ifd_entry(bo, 323, 3, 1, struct.pack("<HH", 2, 0)),   # TileLength
    ]
    n = len(entries) + 2  # + offsets/counts arrays appended after IFD
    arrays_off = ifd_off + 2 + 12 * n + 4
    entries.append(_ifd_entry(bo, 324, 4, 4, struct.pack("<I", arrays_off)))
    entries.append(
        _ifd_entry(bo, 325, 4, 4, struct.pack("<I", arrays_off + 16))
    )
    ifd = struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
    blob = (
        b"II*\x00" + struct.pack("<I", ifd_off) + tile_data + ifd
        + struct.pack("<4I", *offsets) + struct.pack("<4I", 4, 4, 4, 4)
    )
    out = tiff_to_pixels(blob)
    assert out.tolist() == [[1, 2, 3], [4, 5, 6], [7, 8, 9]]


def test_tiled_tiff_bad_grid_is_valueerror():
    px = _grad(8, 8)
    t = pixels_to_tiff(px, tile_size=(4, 4))
    # corrupt TileWidth (tag 322) to 16: grid says 1 tile, file has 4
    idx = t.find(struct.pack("<HHI", 322, 3, 1))
    bad = t[: idx + 8] + struct.pack("<HH", 16, 0) + t[idx + 12 :]
    with pytest.raises(ValueError, match="tile"):
        tiff_to_pixels(bad)


def test_bilevel_tiff_roundtrip_and_external_fixture():
    """BitsPerSample=1 (the scanned-book bilevel case): MSB-first bit
    packing with per-row byte padding, strips and tiles, both byte
    orders — plus a hand-assembled WhiteIsZero fax-style fixture whose
    bytes our writer never produces (it writes BlackIsZero)."""
    rng = np.random.RandomState(5)
    for shape in ((7, 9), (5, 33)):
        bits = rng.rand(*shape) > 0.5
        for comp in (1, 5, 32773):
            for layout in ({"rows_per_strip": 3}, {"tile_size": (8, 4)}):
                t = pixels_to_tiff(bits, compression=comp, **layout)
                back = tiff_to_pixels(t)
                assert np.array_equal(back, bits.astype(np.uint8) * 255)

    # external: 2 rows x 10 cols, WhiteIsZero, hand-packed rows
    # row0 bits 1100000001 -> bytes C0 40 ; row1 bits 0000000000 -> 00 00
    bo = "<"
    pixels = bytes([0xC0, 0x40, 0x00, 0x00])
    entries = [
        _ifd_entry(bo, 256, 3, 1, struct.pack("<HH", 10, 0)),
        _ifd_entry(bo, 257, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 258, 3, 1, struct.pack("<HH", 1, 0)),   # 1 bit
        _ifd_entry(bo, 259, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 262, 3, 1, struct.pack("<HH", 0, 0)),   # WhiteIsZero
        _ifd_entry(bo, 273, 4, 1, struct.pack("<I", 8)),
        _ifd_entry(bo, 277, 3, 1, struct.pack("<HH", 1, 0)),
        _ifd_entry(bo, 278, 3, 1, struct.pack("<HH", 2, 0)),
        _ifd_entry(bo, 279, 4, 1, struct.pack("<I", 4)),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 12) + pixels + ifd
    out = tiff_to_pixels(blob)
    # WhiteIsZero: bit 1 = black = 0 after inversion
    assert out.tolist() == [
        [0, 0, 255, 255, 255, 255, 255, 255, 255, 0],
        [255] * 10,
    ]
    # predictor 2 on bilevel is rejected on both sides
    with pytest.raises(ValueError, match="bilevel"):
        pixels_to_tiff(np.ones((2, 2), dtype=bool), predictor=2)


def test_lzw_decode_without_expected_requires_eoi():
    """ADVICE r7: with expected=None a missing EOI is indistinguishable
    from truncation, so it must raise rather than silently return a
    partial payload; with EOI present expected=None decodes fine."""
    import pytest

    from docling_japanese_books_spark.multimodal.tiff_codec import (
        lzw_decode,
        lzw_encode,
    )

    data = b"spam and eggs" * 7
    full = lzw_encode(data)            # encoder always emits EOI
    assert lzw_decode(full) == data    # expected=None, EOI present: ok
    with pytest.raises(ValueError):
        lzw_decode(full[:-2])          # EOI sheared off: truncation


def test_deflate_roundtrip_gray_rgb_bilevel():
    """Compression 8 (Deflate): exact roundtrips across gray / RGB /
    bilevel, strips and tiles, with and without predictor 2."""
    import numpy as np

    from docling_japanese_books_spark.multimodal.tiff_codec import (
        pixels_to_tiff,
        tiff_to_pixels,
    )

    rng = np.random.RandomState(42)
    gray = rng.randint(0, 256, (11, 17), dtype=np.uint8)
    rgb = rng.randint(0, 256, (9, 13, 3), dtype=np.uint8)
    bits = rng.randint(0, 2, (10, 19)).astype(bool)
    for bo in ("<", ">"):
        assert np.array_equal(
            tiff_to_pixels(pixels_to_tiff(gray, compression=8, byte_order=bo)),
            gray,
        )
        assert np.array_equal(
            tiff_to_pixels(
                pixels_to_tiff(rgb, compression=8, predictor=2, byte_order=bo)
            ),
            rgb,
        )
        assert np.array_equal(
            tiff_to_pixels(pixels_to_tiff(bits, compression=8, byte_order=bo)),
            bits.astype(np.uint8) * 255,
        )
    # tiled + deflate + predictor
    tiled = pixels_to_tiff(rgb, compression=8, predictor=2, tile_size=(8, 4))
    assert np.array_equal(tiff_to_pixels(tiled), rgb)


def test_deflate_legacy_code_32946_decodes():
    """The pre-registration code 32946 must decode identically to 8:
    patch the Compression IFD entry in writer output (the only place the
    SHORT value 8 appears as a tagged entry)."""
    import struct

    import numpy as np

    from docling_japanese_books_spark.multimodal.tiff_codec import (
        pixels_to_tiff,
        tiff_to_pixels,
    )

    px = (np.arange(8 * 12, dtype=np.uint8).reshape(8, 12) * 3) % 256
    blob = bytearray(pixels_to_tiff(px, compression=8, byte_order="<"))
    # II entry: tag(H)=259, type(H)=3, count(I)=1, value SHORT + pad
    old = struct.pack("<HHIHH", 259, 3, 1, 8, 0)
    new = struct.pack("<HHIHH", 259, 3, 1, 32946, 0)
    assert blob.count(old) == 1
    idx = blob.index(old)
    blob[idx : idx + len(old)] = new
    assert np.array_equal(tiff_to_pixels(bytes(blob)), px)


def test_deflate_corrupt_stream_raises_valueerror():
    import numpy as np
    import pytest

    from docling_japanese_books_spark.multimodal.tiff_codec import (
        pixels_to_tiff,
        tiff_to_pixels,
    )

    px = np.full((6, 6), 200, dtype=np.uint8)
    blob = bytearray(pixels_to_tiff(px, compression=8))
    # zlib streams start with 0x78 here (deflate, 32K window): smash it
    zi = blob.index(b"\x78", 8)
    blob[zi] = 0xFF
    with pytest.raises(ValueError):
        tiff_to_pixels(bytes(blob))
