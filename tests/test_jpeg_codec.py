"""The stdlib baseline JPEG codec (llm/jpeg.py) and its registration
in the multimodal seam: encode→decode round trips (4:4:4, 4:2:0,
grayscale, restart intervals, odd dims), the closed-form solid-color
contract the m6 oracle states, loud failures outside scope, and the
strict decode path running on REAL JPEG bytes with no image library."""

import io

import numpy as np
import pytest
from pyspark.sql import Row

from configurable_etl_python_repo_spark.llm import jpeg
from configurable_etl_python_repo_spark.llm.multimodal import (
    extract_features,
    resize_images,
    resolve_image_codec,
    stdlib_auto,
)


def _gradient(w, h, ch):
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def _closed_form_rgb(r, g, b, quality):
    """The module-docstring determinism contract, restated here
    independently (and a third time in the m6 oracle SQL): solid-color
    encode→decode is DC-only end to end."""
    ql, qc = jpeg.scaled_quant_tables(quality)
    qy, qcc = float(ql[0]), float(qc[0])
    y = min(255, max(0, (299 * r + 587 * g + 114 * b + 500) // 1000))
    cb = min(255, max(0, 128 + (
        -168736 * r - 331264 * g + 500000 * b + 500000) // 1000000))
    cr = min(255, max(0, 128 + (
        500000 * r - 418688 * g - 81312 * b + 500000) // 1000000))

    def rec(v, q):
        coef = np.floor((8.0 * (v - 128)) / q + 0.5)
        return min(255, max(0, int(np.floor(coef * q / 8.0 + 128.5))))

    yr, cbr, crr = rec(y, qy), rec(cb, qcc), rec(cr, qcc)
    r2 = min(255, max(0, int(np.floor(yr + 1.402 * (crr - 128.0) + 0.5))))
    g2 = min(255, max(0, int(np.floor(
        yr - 0.344136 * (cbr - 128.0) - 0.714136 * (crr - 128.0) + 0.5))))
    b2 = min(255, max(0, int(np.floor(yr + 1.772 * (cbr - 128.0) + 0.5))))
    return (r2, g2, b2)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_solid_color_round_trip_matches_closed_form(sub):
    """Every pixel of a solid-color round trip equals the documented
    closed form — the property the m6 SQL oracle hash-checks. Both
    subsamplings: constant chroma survives the 2x2 box filter exactly."""
    rng = np.random.default_rng(11)
    for _ in range(40):
        r, g, b = (int(x) for x in rng.integers(0, 256, 3))
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 30))
        q = int(rng.choice([50, 75, 90]))
        blob = jpeg.encode_jpeg(
            "RGB", (w, h), bytes((r, g, b)) * (w * h),
            quality=q, subsampling=sub,
        )
        img = jpeg.decode_jpeg(blob)
        assert (img.mode, img.size) == ("RGB", (w, h))
        px = np.frombuffer(img._data, np.uint8).reshape(h, w, 3)
        assert (px == np.array(_closed_form_rgb(r, g, b, q))).all()


def test_all_256_grays_hit_the_quantization_boundaries_exactly():
    """Quality 50 puts the luma q00 at 16, so odd level-shifted values
    land EXACTLY on .5 quantization boundaries — the case the integer
    block-sum DC and the DC-only IDCT fast path exist for."""
    ql, _ = jpeg.scaled_quant_tables(50)
    qy = float(ql[0])
    assert ql[0] == 16
    for v in range(256):
        blob = jpeg.encode_jpeg("L", (12, 9), bytes([v]) * 108, quality=50)
        img = jpeg.decode_jpeg(blob)
        coef = np.floor((8.0 * (v - 128)) / qy + 0.5)
        want = min(255, max(0, int(np.floor(coef * qy / 8.0 + 128.5))))
        assert set(img._data) == {want}, f"gray {v}"


def test_gradient_round_trip_is_tight_and_noise_is_bounded():
    """Lossy but sane: a smooth gradient at quality 90 reconstructs
    within a few levels per pixel; random noise (worst case for DCT)
    stays within the usual baseline-JPEG error envelope."""
    rng = np.random.default_rng(3)
    w, h = 64, 48
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    grad = np.stack(
        [xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (w + h)], -1
    ).astype(np.uint8)
    dec = np.frombuffer(
        jpeg.decode_jpeg(
            jpeg.encode_jpeg("RGB", (w, h), grad.tobytes(), quality=90)
        )._data,
        np.uint8,
    ).reshape(h, w, 3)
    assert np.abs(grad.astype(int) - dec.astype(int)).max() <= 8

    noise = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = np.frombuffer(
        jpeg.decode_jpeg(
            jpeg.encode_jpeg("RGB", (w, h), noise.tobytes(), quality=90)
        )._data,
        np.uint8,
    ).reshape(h, w, 3)
    rmse = float(
        np.sqrt(((noise.astype(float) - dec.astype(float)) ** 2).mean())
    )
    assert rmse < 20.0


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (8, 8), (17, 9), (16, 16)])
def test_odd_dimensions_and_mcu_padding(w, h):
    """Dims off the 8/16 grids round-trip at full declared size in both
    subsamplings (edge-replicated MCU padding is cropped on decode)."""
    data = _gradient(w, h, 3)
    for sub in ("4:4:4", "4:2:0"):
        img = jpeg.decode_jpeg(
            jpeg.encode_jpeg("RGB", (w, h), data, quality=95,
                             subsampling=sub)
        )
        assert img.size == (w, h)
        assert len(img._data) == w * h * 3


def test_restart_intervals_decode_identically():
    """DRI/RSTn segmentation is a pure container concern: the decoded
    pixels must be bit-identical with and without restart markers, and
    the DRI stream must actually carry RST bytes."""
    w, h = 48, 32
    data = _gradient(w, h, 3)
    plain = jpeg.encode_jpeg("RGB", (w, h), data, quality=85)
    dri = jpeg.encode_jpeg(
        "RGB", (w, h), data, quality=85, restart_interval=3
    )
    assert jpeg.decode_jpeg(plain)._data == jpeg.decode_jpeg(dri)._data
    assert any(
        dri[i] == 0xFF and 0xD0 <= dri[i + 1] <= 0xD7
        for i in range(len(dri) - 1)
    )
    assert not any(
        plain[i] == 0xFF and 0xD0 <= plain[i + 1] <= 0xD7
        for i in range(2, len(plain) - 3)
    )


def test_grayscale_mode_round_trip():
    data = _gradient(24, 17, 1)
    img = jpeg.decode_jpeg(jpeg.encode_jpeg("L", (24, 17), data, quality=92))
    assert (img.mode, img.size) == ("L", (24, 17))
    got = np.frombuffer(img._data, np.uint8).astype(int)
    want = np.frombuffer(data, np.uint8).astype(int)
    assert np.abs(got - want).mean() < 6.0


def test_facade_matches_the_png_conventions():
    """convert("L") is the shared integer luminance; resize is the
    shared nearest-neighbor; save() re-encodes as JPEG (what
    resize_images' format=img.format path calls)."""
    img = jpeg.JpegImage("RGB", (4, 2), _gradient(4, 2, 3))
    d = img._data
    want = [
        (299 * d[i] + 587 * d[i + 1] + 114 * d[i + 2]) // 1000
        for i in range(0, len(d), 3)
    ]
    assert img.convert("L").getdata() == want
    assert img.convert("RGB") is img
    big = jpeg.JpegImage("L", (4, 4), bytes(range(16)))
    assert big.resize((2, 2)).getdata() == [0, 2, 8, 10]
    buf = io.BytesIO()
    jpeg.JpegImage("RGB", (6, 6), bytes((9, 99, 199)) * 36).save(buf)
    again = jpeg.decode_jpeg(buf.getvalue())
    assert again.size == (6, 6)
    with pytest.raises(NotImplementedError, match="JPEG"):
        img.save(io.BytesIO(), format="PNG")


def test_out_of_scope_raises_loudly():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n-not-a-jpeg")
    ok = jpeg.encode_jpeg("L", (8, 8), bytes(64))
    # progressive: patch the SOF0 marker byte to SOF2
    prog = bytearray(ok)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg.decode_jpeg(bytes(prog))
    # arithmetic coding
    arith = bytearray(ok)
    arith[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg.decode_jpeg(bytes(arith))
    # 12-bit precision
    deep = bytearray(ok)
    deep[sof + 4] = 12
    with pytest.raises(NotImplementedError, match="8-bit"):
        jpeg.decode_jpeg(bytes(deep))
    # truncated entropy data
    with pytest.raises(ValueError, match="corrupt JPEG|truncated"):
        jpeg.decode_jpeg(ok[:-20])
    # DHT whose counts disagree with its value list
    bad = bytearray(ok)
    dht = bad.index(b"\xff\xc4")
    bad[dht + 5] = 250  # count for code length 1
    with pytest.raises(ValueError, match="corrupt JPEG"):
        jpeg.decode_jpeg(bytes(bad))
    # a stray marker inside the scan starves the entropy decoder —
    # surfaces as the documented ValueError, never an infinite loop
    cut = bytearray(ok)
    sos = cut.index(b"\xff\xda")
    cut[sos + 10 : sos + 12] = b"\xff\xc3"
    with pytest.raises(ValueError, match="corrupt JPEG"):
        jpeg.decode_jpeg(bytes(cut))


def test_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2 lets an encoder pad any marker with a run of 0xFF
    fill bytes. Other encoders emit them; treating the run as a
    scan-terminating marker misparsed spec-valid streams (ADVICE r11).
    Inject fill both BEFORE EOI (exercises _split_scan) and BEFORE SOS
    (exercises the outer segment loop) and pin pixel equality."""
    ok = jpeg.encode_jpeg("RGB", (6, 5), _gradient(6, 5, 3), quality=80)
    base = jpeg.decode_jpeg(ok)
    assert ok.endswith(b"\xff\xd9")
    padded_eoi = ok[:-2] + b"\xff\xff\xff" + ok[-2:]
    sos = ok.index(b"\xff\xda")
    padded_sos = ok[:sos] + b"\xff\xff" + ok[sos:]
    for variant in (padded_eoi, padded_sos):
        img = jpeg.decode_jpeg(variant)
        assert (img.size, img.mode) == (base.size, base.mode)
        assert img._data == base._data


def test_second_sos_raises_not_implemented():
    """A multi-scan (non-interleaved) baseline stream previously
    overwrote the first scan's segments silently; it must quarantine
    by exception type instead (ADVICE r11)."""
    ok = jpeg.encode_jpeg("L", (8, 8), bytes(range(64)))
    sos = ok.index(b"\xff\xda")
    eoi = ok.rindex(b"\xff\xd9")
    two_scans = ok[:eoi] + ok[sos:eoi] + ok[eoi:]
    with pytest.raises(NotImplementedError, match="second SOS"):
        jpeg.decode_jpeg(two_scans)


def test_strict_extract_features_on_real_jpeg_bytes(spark):
    """Strict mode decodes REAL JPEG bytes in this codec-free
    container — dims come from the SOF0 parse, luminance from the
    actual huffman+IDCT reconstruction."""
    def solid(w, h, rgb, q=50):
        return jpeg.encode_jpeg("RGB", (w, h), bytes(rgb) * (w * h),
                                quality=q)

    rows = [
        Row(doc_id=1, payload=solid(6, 4, (255, 0, 0))),
        Row(doc_id=2, payload=solid(3, 5, (10, 20, 30))),
    ]
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r for r in extract_features(
        df, fake_decode=False, codec="jpeg_stdlib").collect()}
    assert (out[1].features[1], out[1].features[2]) == (6.0, 4.0)
    for doc_id, rgb in ((1, (255, 0, 0)), (2, (10, 20, 30))):
        r2, g2, b2 = _closed_form_rgb(*rgb, 50)
        lum = (299 * r2 + 587 * g2 + 114 * b2) // 1000
        assert out[doc_id].features[4:] == pytest.approx([lum / 255.0] * 4)
    # a PNG fed to the jpeg codec fails loudly, and the sniffing
    # default ("stdlib" / None-without-Pillow) decodes BOTH formats
    from configurable_etl_python_repo_spark.llm import png

    mixed = spark.createDataFrame([
        Row(doc_id=1, payload=solid(6, 4, (255, 0, 0))),
        Row(doc_id=2, payload=png.encode_png("RGB", (3, 2),
                                             bytes((1, 2, 3)) * 6)),
    ])
    with pytest.raises(Exception, match="not a JPEG"):
        extract_features(mixed, fake_decode=False,
                         codec="jpeg_stdlib").collect()
    both = {r.doc_id: r for r in extract_features(
        mixed, fake_decode=False, codec="stdlib").collect()}
    assert (both[1].features[1], both[2].features[1]) == (6.0, 3.0)


def test_strict_resize_on_real_jpeg_bytes(spark):
    """resize_images over jpeg_stdlib: true SOF dims, the shared
    integer clamp, and a resized_md5 equal to an offline
    decode→resize→re-encode of the same payload."""
    import hashlib

    grad = jpeg.encode_jpeg("RGB", (96, 32), _gradient(96, 32, 3),
                            quality=90)
    df = spark.createDataFrame([Row(doc_id=1, payload=grad)])
    out = resize_images(df, max_side=48, fake_decode=False,
                        codec="jpeg_stdlib").collect()[0]
    assert (out.src_width, out.src_height) == (96, 32)
    assert (out.out_width, out.out_height) == (48, 16)
    buf = io.BytesIO()
    jpeg.decode_jpeg(grad).resize((48, 16)).save(buf, format="JPEG")
    assert out.resized_md5 == hashlib.md5(buf.getvalue()).hexdigest()


def test_registry_resolves_jpeg_names():
    assert resolve_image_codec("jpeg_stdlib") is jpeg
    assert resolve_image_codec("stdlib") is stdlib_auto
    blob = jpeg.encode_jpeg("L", (2, 2), bytes(4))
    assert stdlib_auto.open(io.BytesIO(blob)).size == (2, 2)
