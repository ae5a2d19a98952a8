"""The stdlib WAV codec (llm/wavcodec.py) and extract_audio_features:
round trips, a CROSS-CHECK against the independent stdlib ``wave``
module in both directions, loud failures outside scope, and the strict
audio path running on REAL RIFF/PCM bytes in Spark."""

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest
from pyspark.sql import Row

from configurable_etl_python_repo_spark.llm import wavcodec
from configurable_etl_python_repo_spark.llm.multimodal import (
    extract_audio_features,
    resolve_audio_codec,
)


def _square(amp, half_period, n, channels=1):
    """The m7 fixture signal: ±amp alternating every half_period
    frames — every feature is closed-form (rms == amp exactly)."""
    i = np.arange(n)
    x = np.where((i // half_period) % 2 == 0, amp, -amp).astype(np.int32)
    return np.repeat(x[:, None], channels, axis=1)


@pytest.mark.parametrize("bits,channels", [(16, 1), (16, 2), (8, 1), (8, 3)])
def test_round_trip(bits, channels):
    rng = np.random.default_rng(5)
    lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
    x = rng.integers(lo, hi, (777, channels), dtype=np.int64)
    blob = wavcodec.encode_wav(22050, x, bits=bits)
    a = wavcodec.decode_wav(blob)
    assert (a.sample_rate, a.n_channels, a.n_frames, a.bits) == (
        22050, channels, 777, bits,
    )
    assert (a.samples == x).all()
    assert a.duration_ms == 777 * 1000 // 22050


def test_cross_check_against_stdlib_wave_both_directions():
    """External validity: the independent stdlib ``wave`` module reads
    our encodes sample-for-sample, and we read its encodes — unlike
    JPEG, a second implementation exists in every container."""
    x = _square(12000, 3, 500, channels=2)
    blob = wavcodec.encode_wav(16000, x, bits=16)
    with stdlib_wave.open(io.BytesIO(blob)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (
            16000, 2, 2,
        )
        assert w.getnframes() == 500
        theirs = np.frombuffer(
            w.readframes(500), dtype="<i2"
        ).reshape(-1, 2)
    assert (theirs == x).all()

    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x[:, 0].astype("<i2").tobytes())
    ours = wavcodec.decode_wav(buf.getvalue())
    assert (ours.sample_rate, ours.n_channels, ours.n_frames) == (
        8000, 1, 500,
    )
    assert (ours.samples[:, 0] == x[:, 0]).all()


def test_unknown_chunks_are_skipped():
    """LIST/fact chunks (and RIFF word alignment of odd-sized ones)
    must not derail the fmt/data scan."""
    x = _square(100, 2, 10)
    blob = bytearray(wavcodec.encode_wav(44100, x))
    # splice a LIST chunk (odd size -> pad byte) between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytes(blob[:12]) + extra + bytes(blob[12:])
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    a = wavcodec.decode_wav(spliced)
    assert (a.samples == x).all()


def test_out_of_scope_raises_loudly():
    with pytest.raises(ValueError, match="not a WAV"):
        wavcodec.decode_wav(b"\xff\xd8\xff\xe0 jpeg, not wav")
    ok = bytearray(wavcodec.encode_wav(8000, _square(5, 1, 8)))
    fmt_off = ok.index(b"fmt ") + 8
    # IEEE float format tag
    flt = bytearray(ok)
    struct.pack_into("<H", flt, fmt_off, 3)
    with pytest.raises(NotImplementedError, match="float"):
        wavcodec.decode_wav(bytes(flt))
    # extensible
    ext = bytearray(ok)
    struct.pack_into("<H", ext, fmt_off, 0xFFFE)
    with pytest.raises(NotImplementedError, match="EXTENSIBLE"):
        wavcodec.decode_wav(bytes(ext))
    # 24-bit
    deep = bytearray(ok)
    struct.pack_into("<H", deep, fmt_off + 14, 24)
    with pytest.raises(NotImplementedError, match="8/16-bit"):
        wavcodec.decode_wav(bytes(deep))
    # truncated data chunk
    with pytest.raises(ValueError, match="truncated"):
        wavcodec.decode_wav(bytes(ok[:-5]))
    # data size not a frame multiple (stereo 16-bit, 6 bytes)
    stereo = bytearray(wavcodec.encode_wav(8000, _square(5, 1, 4, 2)))
    data_off = stereo.index(b"data")
    struct.pack_into("<I", stereo, data_off + 4, 6)
    # shrink RIFF size accordingly so the chunk walk stays in bounds
    cut = bytes(stereo[: data_off + 8 + 6])
    cut = cut[:4] + struct.pack("<I", len(cut) - 8) + cut[8:]
    with pytest.raises(ValueError, match="multiple"):
        wavcodec.decode_wav(cut)
    # encoder guards
    with pytest.raises(ValueError, match="int16"):
        wavcodec.encode_wav(8000, np.array([40000]))
    with pytest.raises(ValueError, match="8 or 16"):
        wavcodec.encode_wav(8000, np.array([1]), bits=24)


def test_registry():
    assert resolve_audio_codec(None) is wavcodec
    assert resolve_audio_codec("wav_stdlib") is wavcodec
    with pytest.raises(ValueError, match="unknown audio codec"):
        resolve_audio_codec("mp3")

    class Injected:
        decode_wav = staticmethod(wavcodec.decode_wav)

    inj = Injected()
    assert resolve_audio_codec(inj) is inj


def test_strict_audio_features_on_real_wav_bytes(spark):
    """Strict mode parses REAL RIFF bytes in Spark: the documented
    feature conventions (rms over all channels from an exact int64
    square sum; zero crossings on channel 0) hold on the closed-form
    square-wave fixture."""
    amp, hp, n = 9000, 4, 1000
    rows = [
        Row(doc_id=1, payload=wavcodec.encode_wav(
            16000, _square(amp, hp, n, 1))),
        Row(doc_id=2, payload=wavcodec.encode_wav(
            8000, _square(amp, hp, n, 2))),
        Row(doc_id=3, payload=wavcodec.encode_wav(
            8000, np.zeros((0, 1), dtype=np.int32))),
    ]
    out = {r.doc_id: r for r in extract_audio_features(
        spark.createDataFrame(rows), fake_decode=False).collect()}
    for doc_id, ch, sr in ((1, 1, 16000), (2, 2, 8000)):
        r = out[doc_id]
        assert (r.sample_rate, r.n_channels, r.n_frames) == (sr, ch, n)
        assert r.duration_ms == n * 1000 // sr
        assert r.rms == float(amp)  # exact: sqrt of a perfect square
        assert r.peak == amp
        assert r.zero_crossings == (n - 1) // hp
    assert (out[3].n_frames, out[3].rms, out[3].zero_crossings) == (0, 0.0, 0)
    # a JPEG fed to the audio path fails loudly
    bad = spark.createDataFrame([Row(doc_id=9, payload=b"\xff\xd8\xff")])
    with pytest.raises(Exception, match="not a WAV"):
        extract_audio_features(bad, fake_decode=False).collect()


def test_fake_audio_path_is_md5_deterministic(spark):
    """The fake path (SQL-oracle stand-in) derives every field from
    the content hash — same payload, same features, any partitioning."""
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=b"abc"), Row(doc_id=2, payload=b"abc")]
    )
    a, b = sorted(
        extract_audio_features(df, fake_decode=True).collect(),
        key=lambda r: r.doc_id,
    )
    assert a[1:] == b[1:]
    assert a.duration_ms == a.n_frames * 1000 // a.sample_rate
