"""The stdlib PNG codec (llm/png.py) and its registration in the
multimodal seam: encode→decode round trips exercising every scanline
filter, luminance/resize determinism, loud failures outside scope, and
the strict decode path running on REAL bytes with no image library."""

import io
import zlib

import pytest
from pyspark.sql import Row

from configurable_etl_python_repo_spark.llm import png
from configurable_etl_python_repo_spark.llm.multimodal import (
    extract_features,
    resize_images,
    resolve_image_codec,
)


def _gradient(w, h, ch):
    """Per-pixel formula data — makes every filter type non-trivial."""
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("mode,ch", [("L", 1), ("RGB", 3),
                                     ("LA", 2), ("RGBA", 4)])
def test_round_trip_all_modes_and_filters(mode, ch):
    """encode_png rotates filter types per row (y % 5), so a >=5-row
    image round-trips through ALL of None/Sub/Up/Average/Paeth."""
    w, h = 11, 9
    data = _gradient(w, h, ch)
    blob = png.encode_png(mode, (w, h), data)
    img = png.decode_png(blob)
    assert (img.mode, img.size) == (mode, (w, h))
    assert img._data == data
    # the PIL-shaped module surface round-trips too
    assert png.open(io.BytesIO(blob))._data == data
    buf = io.BytesIO()
    img.save(buf)
    assert png.decode_png(buf.getvalue())._data == data


def test_filter_rotation_actually_happens():
    """Guard the fixture property the m4/m5 rows rely on: the raw
    (decompressed) scanline stream carries filter types 0..4."""
    blob = png.encode_png("L", (8, 10), _gradient(8, 10, 1))
    # IDAT body: skip magic(8) + IHDR chunk(12+13); then len/tag
    idat_off = 8 + 12 + 13
    (length,) = __import__("struct").unpack(
        ">I", blob[idat_off: idat_off + 4])
    raw = zlib.decompress(blob[idat_off + 8: idat_off + 8 + length])
    ftypes = {raw[y * 9] for y in range(10)}
    assert ftypes == {0, 1, 2, 3, 4}


def test_luminance_and_resize_are_the_documented_formulas():
    img = png.PngImage("RGB", (4, 2), _gradient(4, 2, 3))
    g = img.convert("L")
    d = img._data
    want = [
        (299 * d[i] + 587 * d[i + 1] + 114 * d[i + 2]) // 1000
        for i in range(0, len(d), 3)
    ]
    assert g.getdata() == want
    # LA drops alpha; L converts to itself (same object)
    la = png.PngImage("LA", (2, 2), bytes(range(8)))
    assert la.convert("L").getdata() == [0, 2, 4, 6]
    assert g.convert("L") is g
    # nearest-neighbor: src = dst * n // m
    big = png.PngImage("L", (4, 4), bytes(range(16)))
    small = big.resize((2, 2))
    assert small.getdata() == [0, 2, 8, 10]
    up = png.PngImage("L", (2, 1), bytes([9, 200])).resize((4, 1))
    assert up.getdata() == [9, 9, 200, 200]


def test_out_of_scope_raises_loudly():
    with pytest.raises(ValueError, match="not a PNG"):
        png.decode_png(b"\xff\xd8\xff\xe0JFIF-not-a-png")  # JPEG magic
    ok = png.encode_png("L", (3, 3), bytes(9))
    # 16-bit depth
    deep = bytearray(ok)
    deep[8 + 8 + 8] = 16  # IHDR bit-depth byte
    with pytest.raises(NotImplementedError, match="8-bit"):
        png.decode_png(bytes(deep))
    # palette color type
    pal = bytearray(ok)
    pal[8 + 8 + 9] = 3
    with pytest.raises(NotImplementedError, match="color type 3"):
        png.decode_png(bytes(pal))
    # Adam7 interlace
    lace = bytearray(ok)
    lace[8 + 8 + 12] = 1
    with pytest.raises(NotImplementedError, match="interlaced"):
        png.decode_png(bytes(lace))
    with pytest.raises(ValueError, match="truncated|missing"):
        png.decode_png(ok[:20])
    with pytest.raises(NotImplementedError, match="PNG"):
        png.PngImage("L", (1, 1), b"x").save(io.BytesIO(), format="JPEG")


def test_malformed_bytes_raise_valueerror_never_leak(spark):
    """Quarantine-by-exception-type must work: corrupt IDAT and short
    IHDR surface as the documented ValueError, never raw zlib.error /
    struct.error; and a payload whose IDAT inflates past its declared
    dims (a decompression bomb) is rejected at the declared bound."""
    import struct as _struct

    ok = png.encode_png("L", (3, 3), bytes(9))
    # corrupt the IDAT body (flip bytes after its 8-byte header)
    idat_off = 8 + 12 + 13 + 8
    bad = bytearray(ok)
    for i in range(idat_off, min(idat_off + 6, len(bad) - 12)):
        bad[i] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt PNG"):
        png.decode_png(bytes(bad))
    # short IHDR: shrink the declared chunk length and body — keep the
    # real IDAT+IEND chunks so the 13-byte length guard (not the
    # missing-chunk guard) is what fires
    ihdr_end = 8 + 12 + 13
    short = (
        ok[:8]
        + _struct.pack(">I", 5) + b"IHDR" + ok[16:21] + b"\x00" * 4
        + ok[ihdr_end:]
    )
    with pytest.raises(ValueError, match="expected 13"):
        png.decode_png(short)
    # zero-dimension bomb bypass: w=0 would make the inflate bound 0
    # (zlib max_length=0 = unlimited) — must be rejected pre-inflate
    zero = bytearray(ok)
    zero[16:20] = _struct.pack(">I", 0)
    with pytest.raises(ValueError, match="dimensions"):
        png.decode_png(bytes(zero))
    # bomb: big real image, IHDR patched to claim tiny dims — must be
    # rejected at the declared bound, not after a full inflate
    big = bytearray(png.encode_png("L", (100, 100), bytes(10000)))
    big[16:24] = _struct.pack(">II", 3, 3)
    with pytest.raises(ValueError, match="inflate|declares"):
        png.decode_png(bytes(big))
    # and the Spark strict path stays a clean Python exception chain
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=1, payload=bytes(bad))])
    with pytest.raises(Exception, match="corrupt PNG"):
        extract_features(df, fake_decode=False,
                         codec="png_stdlib").collect()


def test_codec_registry_resolution():
    from configurable_etl_python_repo_spark.llm.multimodal import (
        stdlib_auto,
    )

    assert resolve_image_codec("png_stdlib") is png
    assert resolve_image_codec("stdlib") is stdlib_auto
    with pytest.raises(ValueError, match="unknown image codec"):
        resolve_image_codec("webp")
    try:
        from PIL import Image  # noqa: F401

        assert resolve_image_codec(None) is not png
    except ImportError:
        # the dependency-free floor: None falls back to the stdlib
        # magic-byte dispatcher (PNG or baseline JPEG)
        assert resolve_image_codec(None) is stdlib_auto
        with pytest.raises(NotImplementedError, match="Pillow"):
            resolve_image_codec("pil")
    # the dispatcher routes by magic and fails loudly otherwise
    blob = png.encode_png("L", (2, 2), bytes(4))
    assert stdlib_auto.open(io.BytesIO(blob)).size == (2, 2)
    with pytest.raises(ValueError, match="unrecognized image payload"):
        stdlib_auto.open(io.BytesIO(b"RIFF....WEBP"))


def test_strict_extract_features_on_real_png_bytes(spark):
    """The longest-standing weak item, closed for PNG: strict mode
    (fake_decode=False) decodes REAL bytes in this codec-free
    container — features carry the true dims and the true 2x2
    grayscale thumbnail."""
    def solid(w, h, rgb):
        return png.encode_png("RGB", (w, h), bytes(rgb) * (w * h))

    rows = [
        Row(doc_id=1, payload=solid(6, 4, (255, 0, 0))),
        Row(doc_id=2, payload=solid(3, 5, (10, 20, 30))),
    ]
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r for r in extract_features(
        df, fake_decode=False, codec="png_stdlib").collect()}
    assert (out[1].features[1], out[1].features[2]) == (6.0, 4.0)
    assert out[1].features[3] == 24.0
    lum1 = (299 * 255) // 1000
    assert out[1].features[4:] == pytest.approx([lum1 / 255.0] * 4)
    lum2 = (299 * 10 + 587 * 20 + 114 * 30) // 1000
    assert out[2].features[4:] == pytest.approx([lum2 / 255.0] * 4)
    assert out[1].n_bytes == len(rows[0].payload)
    # non-PNG payloads fail loudly, never fake-decode silently
    bad = spark.createDataFrame([Row(doc_id=3, payload=b"JFIF")])
    with pytest.raises(Exception, match="not a PNG"):
        extract_features(bad, fake_decode=False,
                         codec="png_stdlib").collect()


def test_strict_resize_on_real_png_bytes(spark):
    """resize_images strict path over png_stdlib: true source dims,
    the shared clamp math, and a resized_md5 that equals an offline
    decode→resize→encode of the same payload."""
    import hashlib

    grad = png.encode_png("RGB", (1024, 256), _gradient(1024, 256, 3))
    tiny = png.encode_png("L", (40, 30), _gradient(40, 30, 1))
    df = spark.createDataFrame([
        Row(doc_id=1, payload=grad),
        Row(doc_id=2, payload=tiny),
    ])
    out = {r.doc_id: r for r in resize_images(
        df, max_side=512, fake_decode=False,
        codec="png_stdlib").collect()}
    assert (out[1].src_width, out[1].src_height) == (1024, 256)
    assert (out[1].out_width, out[1].out_height) == (512, 128)
    assert (out[2].out_width, out[2].out_height) == (40, 30)  # untouched
    buf = io.BytesIO()
    png.decode_png(grad).resize((512, 128)).save(buf)
    assert out[1].resized_md5 == hashlib.md5(buf.getvalue()).hexdigest()
