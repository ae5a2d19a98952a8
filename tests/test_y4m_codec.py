"""The stdlib Y4M video codec (llm/y4m.py): encode→decode round
trips across colorspaces, the PyAV-shaped facade contract, exact
integer timestamps, loud failures outside scope, and the strict
frame-sampling paths (sample_frames / frame_stats) on REAL Y4M bytes
in Spark with no video library."""

import io

import numpy as np
import pytest
from pyspark.sql import Row

from configurable_etl_python_repo_spark.llm import y4m
from configurable_etl_python_repo_spark.llm.multimodal import (
    frame_stats,
    resolve_video_codec,
    sample_frames,
)


def _solid_frames(w, h, values, colorspace="420jpeg", uv=128):
    sub = {"420jpeg": (2, 2), "422": (2, 1), "444": (1, 1)}.get(colorspace)
    out = []
    for v in values:
        y = np.full((h, w), v, np.uint8)
        if colorspace == "mono":
            out.append((y, None, None))
        else:
            cw, ch = w // sub[0], h // sub[1]
            out.append(
                (y, np.full((ch, cw), uv, np.uint8),
                 np.full((ch, cw), uv, np.uint8))
            )
    return out


@pytest.mark.parametrize("space", ["420jpeg", "422", "444", "mono"])
def test_round_trip_all_colorspaces(space):
    w, h = 16, 8
    vals = [5, 15, 25]
    blob = y4m.encode_y4m(
        (w, h), _solid_frames(w, h, vals, space), fps=(25, 1),
        colorspace=space,
    )
    with y4m.open(io.BytesIO(blob)) as c:
        assert (c.width, c.height) == (w, h)
        assert (c.fps_num, c.fps_den) == (25, 1)
        frames = list(c.decode(video=0))
    assert [f.index for f in frames] == [0, 1, 2]
    assert [f.time_ms for f in frames] == [0, 40, 80]
    for f, v in zip(frames, vals):
        assert (f.y == v).all()
        if space == "mono":
            assert f.u is None
        else:
            assert (f.u == 128).all() and (f.v == 128).all()


def test_time_ms_is_exact_integer_math():
    """idx=3 at 25fps is 120 ms — float seconds*1000 would truncate to
    119 (0.12*1000 == 119.999…); .time_ms must not."""
    blob = y4m.encode_y4m(
        (4, 4), _solid_frames(4, 4, [0, 0, 0, 0], "444"),
        fps=(25, 1), colorspace="444",
    )
    frames = list(y4m.open(io.BytesIO(blob)).decode())
    assert frames[3].time_ms == 120
    assert int(frames[3].time * 1000) in (119, 120)  # the float hazard
    # NTSC-ish rational rate: 30000/1001 -> frame 30 at 1001 ms
    blob = y4m.encode_y4m(
        (4, 4), _solid_frames(4, 4, [0] * 31, "444"),
        fps=(30000, 1001), colorspace="444",
    )
    assert list(y4m.open(io.BytesIO(blob)).decode())[30].time_ms == 1001


def test_to_image_is_the_documented_ycbcr_conversion():
    """Neutral chroma (128) reconstructs R=G=B=Y exactly under the
    jpeg.py floor(x+0.5) contract; mono yields mode 'L'."""
    blob = y4m.encode_y4m(
        (4, 2), _solid_frames(4, 2, [77], "420jpeg"), colorspace="420jpeg"
    )
    img = next(y4m.open(io.BytesIO(blob)).decode()).to_image()
    assert (img.mode, img.size) == ("RGB", (4, 2))
    assert set(img.getdata()) == {(77, 77, 77)}
    mono = y4m.encode_y4m(
        (4, 2), _solid_frames(4, 2, [9], "mono"), colorspace="mono"
    )
    img = next(y4m.open(io.BytesIO(mono)).decode()).to_image()
    assert (img.mode, set(img.getdata())) == ("L", {9})
    # non-neutral chroma follows the documented formulas
    f = _solid_frames(4, 2, [100], "444", uv=200)
    blob = y4m.encode_y4m((4, 2), f, colorspace="444")
    img = next(y4m.open(io.BytesIO(blob)).decode()).to_image()
    r = min(255, max(0, int(np.floor(100 + 1.402 * 72 + 0.5))))
    b = min(255, max(0, int(np.floor(100 + 1.772 * 72 + 0.5))))
    g = min(255, max(0, int(np.floor(
        100 - 0.344136 * 72 - 0.714136 * 72 + 0.5))))
    assert set(img.getdata()) == {(r, g, b)}


def test_out_of_scope_raises_loudly():
    with pytest.raises(ValueError, match="not a Y4M"):
        y4m.Y4MVideo(b"\x00\x00\x00\x18ftypmp42 an mp4, not y4m")
    ok = y4m.encode_y4m(
        (4, 4), _solid_frames(4, 4, [1], "444"), colorspace="444"
    )
    with pytest.raises(NotImplementedError, match="progressive"):
        y4m.Y4MVideo(ok.replace(b" Ip ", b" It "))
    with pytest.raises(NotImplementedError, match="C411"):
        y4m.Y4MVideo(ok.replace(b"C444", b"C411"))
    with pytest.raises(ValueError, match="missing W/H/F"):
        y4m.Y4MVideo(b"YUV4MPEG2 W4 H4\nFRAME\n")
    with pytest.raises(ValueError, match="divisible"):
        y4m.Y4MVideo(ok.replace(b"W4 H4", b"W5 H4")
                     .replace(b"C444", b"C420jpeg"))
    with pytest.raises(ValueError, match="truncated"):
        list(y4m.Y4MVideo(ok[:-3]).decode())
    with pytest.raises(ValueError, match="expected FRAME"):
        list(y4m.Y4MVideo(ok.replace(b"FRAME\n", b"FROG!\n")).decode())
    # encoder guards
    with pytest.raises(ValueError, match="not divisible"):
        y4m.encode_y4m((5, 4), [], colorspace="420jpeg")
    with pytest.raises(ValueError, match="Y plane"):
        y4m.encode_y4m(
            (4, 4), [(np.zeros((2, 2), np.uint8), None, None)],
            colorspace="mono",
        )


def test_registry():
    try:
        import av  # noqa: F401

        assert resolve_video_codec(None) is not y4m
    except ImportError:
        assert resolve_video_codec(None) is y4m
        with pytest.raises(NotImplementedError, match="PyAV"):
            resolve_video_codec("pyav")
    assert resolve_video_codec("y4m_stdlib") is y4m
    with pytest.raises(ValueError, match="unknown video codec"):
        resolve_video_codec("mp4")


def test_strict_sample_frames_on_real_y4m_bytes(spark):
    """sample_frames' strict path (the old PyAV-only branch) now runs
    on real Y4M bytes: every-other-frame sampling at 25fps/80ms, the
    md5 tag equal to an offline decode→to_image→PNG-encode."""
    import hashlib

    w, h = 16, 8
    blob = y4m.encode_y4m(
        (w, h), _solid_frames(w, h, [10, 20, 30, 40, 50], "420jpeg"),
        fps=(25, 1), colorspace="420jpeg",
    )
    df = spark.createDataFrame([Row(doc_id=1, payload=blob)])
    out = sorted(
        sample_frames(df, every_ms=80, max_frames=32,
                      fake_decode=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.frame_ms) for r in out] == [
        (0, 0), (1, 80), (2, 160)
    ]
    img = list(y4m.open(io.BytesIO(blob)).decode())[2].to_image()
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    assert out[1].frame_md5 == hashlib.md5(buf.getvalue()).hexdigest()
    # a non-Y4M payload fails loudly through the seam
    bad = spark.createDataFrame([Row(doc_id=2, payload=b"RIFFxxxxAVI ")])
    with pytest.raises(Exception, match="not a Y4M"):
        sample_frames(bad, fake_decode=False).collect()


def test_frame_stats_on_real_y4m_bytes(spark):
    """frame_stats: dims + integer mean luma per sampled frame, the
    max_frames cap, and exact frame_ms."""
    w, h = 8, 4
    vals = [7, 17, 27, 37, 47, 57]
    blob = y4m.encode_y4m(
        (w, h), _solid_frames(w, h, vals, "444"), fps=(25, 1),
        colorspace="444",
    )
    df = spark.createDataFrame([Row(doc_id=1, payload=blob)])
    out = sorted(
        frame_stats(df, every_ms=80, max_frames=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.frame_ms, r.width, r.height, r.mean_luma)
            for r in out] == [(0, 0, 8, 4, 7), (1, 80, 8, 4, 27)]
