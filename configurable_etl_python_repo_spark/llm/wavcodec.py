"""Stdlib-only WAV (RIFF PCM) codec for the multimodal seam — zero new
dependencies (struct + numpy views). Gives the audio modality the same
real-bytes strict path PNG/JPEG now have for images: parse the actual
container, de-interleave the actual samples.

Scope (raises loudly outside it, the png.py/jpeg.py convention):
- DECODE: RIFF/WAVE, PCM (format tag 1) at 8-bit unsigned or 16-bit
  signed little-endian, any channel count/sample rate; unknown chunks
  (LIST, fact, cue, ...) are skipped by their declared size. Float
  (tag 3), A-law/mu-law (6/7), ADPCM, and WAVE_FORMAT_EXTENSIBLE
  (0xFFFE) raise NotImplementedError naming the gap; non-RIFF magic
  and truncated/inconsistent chunks raise ValueError
  (quarantine-by-exception-type for untrusted crawl corpora).
- ENCODE (the fixture dual): the same PCM subset.

The decoder is validated two ways: round trips against its own
encoder, and CROSS-CHECKED against the stdlib ``wave`` module in both
directions (tests/test_wav_codec.py) — unlike JPEG, a second,
independent implementation exists in every container, so external
validity is free.

Reference parity: the reference repo has no media handling at all
(/root/reference/Configurable_ETL_Python.py — tabular pandas only);
this is LLM-curation extension surface. Format layout follows the
public RIFF/WAVE specification.

Spark posture: pure per-payload byte work with no driver state — runs
inside Arrow-batched mapInPandas (llm/multimodal.extract_audio_features)
like the image codecs; payload-dominated partition sizing unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

_FORMAT_NAMES = {
    3: "IEEE float (format 3)",
    6: "A-law (format 6)",
    7: "mu-law (format 7)",
    0xFFFE: "WAVE_FORMAT_EXTENSIBLE (format 0xfffe)",
}


class WavAudio:
    """Decoded PCM audio: ``samples`` is an int32 array of shape
    (n_frames, n_channels) (values in the source bit-depth's range),
    plus the container facts a feature extractor needs."""

    def __init__(
        self, sample_rate: int, samples: np.ndarray, bits: int
    ) -> None:
        self.sample_rate = int(sample_rate)
        self.samples = samples
        self.bits = int(bits)

    @property
    def n_channels(self) -> int:
        return int(self.samples.shape[1])

    @property
    def n_frames(self) -> int:
        return int(self.samples.shape[0])

    @property
    def duration_ms(self) -> int:
        """Integer math (n_frames * 1000 // rate) — SQL-restatable."""
        return self.n_frames * 1000 // self.sample_rate


def encode_wav(
    sample_rate: int, samples: np.ndarray, bits: int = 16
) -> bytes:
    """The encoder dual: PCM RIFF/WAVE from an (n_frames, n_channels)
    int array. bits=16 stores signed LE int16; bits=8 stores unsigned
    (value + 128). Deterministic for a given input."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be (frames, channels), got {arr.shape}")
    n_frames, n_ch = arr.shape
    if n_ch < 1 or n_frames < 0:
        raise ValueError(f"bad shape {arr.shape}")
    if bits == 16:
        if arr.min(initial=0) < -32768 or arr.max(initial=0) > 32767:
            raise ValueError("16-bit samples must fit int16")
        data = arr.astype("<i2").tobytes()
    elif bits == 8:
        if arr.min(initial=0) < -128 or arr.max(initial=0) > 127:
            raise ValueError("8-bit samples must fit int8 (stored +128)")
        data = (arr + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block = n_ch * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, int(sample_rate),
        int(sample_rate) * block, block, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF word alignment
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> WavAudio:
    """Parse a RIFF/WAVE byte string. ValueError for non-WAV or corrupt
    bytes; NotImplementedError for valid WAVs outside the PCM 8/16-bit
    scope."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            "not a WAV (bad RIFF/WAVE magic) — wav_stdlib decodes "
            "PCM WAV only"
        )
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"corrupt WAV: truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"corrupt WAV: fmt chunk is {size} bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        # all other chunks (LIST, fact, cue, bext, ...) are skipped
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt /data chunk")
    tag_, n_ch, rate, _byte_rate, block, bits = fmt
    if tag_ != 1:
        raise NotImplementedError(
            f"wav_stdlib decodes PCM only, not "
            f"{_FORMAT_NAMES.get(tag_, f'format {tag_}')}"
        )
    if bits not in (8, 16):
        raise NotImplementedError(
            f"wav_stdlib decodes 8/16-bit PCM only ({bits}-bit)"
        )
    if n_ch < 1 or rate < 1:
        raise ValueError(f"corrupt WAV: {n_ch} channels at {rate} Hz")
    want_block = n_ch * (bits // 8)
    if block != want_block:
        raise ValueError(
            f"corrupt WAV: block align {block} != channels*width "
            f"{want_block}"
        )
    usable = len(data) - len(data) % block
    if usable != len(data):
        raise ValueError(
            f"corrupt WAV: data size {len(data)} is not a multiple of "
            f"the {block}-byte frame"
        )
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    else:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    return WavAudio(rate, arr.reshape(-1, n_ch), bits)
