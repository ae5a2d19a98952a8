"""Stdlib-only Y4M (YUV4MPEG2) video codec for the multimodal seam —
zero new dependencies (bytes + numpy views). Gives the video modality
a real-bytes strict path in a container without PyAV: Y4M is the
uncompressed interchange format every ffmpeg ships (`-f yuv4mpeg`), so
"decode real video frames with no video library" is genuinely useful,
not a toy — a 100 TB pipeline that pre-transcodes crawl video to Y4M
segments can frame-sample with nothing but this parser.

Scope (raises loudly outside it, the png/jpeg/wav convention):
- Stream header `YUV4MPEG2 W<w> H<h> F<num>:<den> [I? A?:? C<space>]`,
  colorspaces C420jpeg / C420 / C420mpeg2 / C420paldv (all share
  4:2:0 plane sizes) / C422 / C444 / Cmono; per-frame `FRAME[...]`
  headers with parameters skipped. Interlaced streams (`It`/`Ib`/`Im`)
  raise NotImplementedError; anything without the YUV4MPEG2 magic
  raises ValueError; short frames / odd dims for subsampled
  colorspaces raise ValueError.

The PyAV-shaped facade (`open()` → container → `.decode(video=0)` →
frames with `.time` / `.time_ms` / `.to_image()`) plugs into
llm/multimodal.resolve_video_codec so sample_frames / frame_stats run
identically over PyAV or this parser. `.to_image()` performs the REAL
YCbCr→RGB conversion with the exact jpeg.py rounding contract
(floor(x + 0.5) doubles, nearest-neighbor chroma upsampling), so a
solid-chroma fixture's pixel values are SQL-restatable; `.time_ms` is
exact integer math (idx * 1000 * den // num) — the float-seconds
`.time` mirrors PyAV but integer callers should prefer `.time_ms`.

Reference parity: the reference repo has no media handling at all
(/root/reference/Configurable_ETL_Python.py); this is LLM-curation
extension surface. Format layout follows the public mjpegtools
YUV4MPEG2 specification.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

#: colorspace -> (chroma width divisor, chroma height divisor); None = mono
_SPACES = {
    b"420jpeg": (2, 2),
    b"420": (2, 2),
    b"420mpeg2": (2, 2),
    b"420paldv": (2, 2),
    b"422": (2, 1),
    b"444": (1, 1),
    b"mono": None,
}


class Y4MFrame:
    """One decoded frame: uint8 planes (y always; u/v None for mono)."""

    def __init__(self, index, y, u, v, fps_num, fps_den):
        self.index = int(index)
        self.y, self.u, self.v = y, u, v
        self._num, self._den = fps_num, fps_den

    @property
    def time_ms(self) -> int:
        """Exact frame timestamp in ms (integer math, no float)."""
        return self.index * 1000 * self._den // self._num

    @property
    def time(self) -> float:
        """PyAV-shaped float seconds (prefer time_ms for integers)."""
        return self.time_ms / 1000.0

    def to_image(self):
        """REAL YCbCr→RGB (the jpeg.py rounding contract: floor(x+0.5)
        doubles, nearest-neighbor chroma upsampling) as a PngImage —
        mono frames become mode 'L'. PngImage.save(format='PNG') then
        matches PyAV's frame.to_image().save(..., 'PNG') shape."""
        from .png import PngImage

        h, w = self.y.shape
        if self.u is None:
            return PngImage("L", (w, h), self.y.tobytes())
        y = self.y.astype(np.float64)
        # nearest-neighbor upsample to full res (replicate)
        cb = np.repeat(
            np.repeat(self.u, -(-h // self.u.shape[0]), axis=0),
            -(-w // self.u.shape[1]), axis=1,
        )[:h, :w].astype(np.float64)
        cr = np.repeat(
            np.repeat(self.v, -(-h // self.v.shape[0]), axis=0),
            -(-w // self.v.shape[1]), axis=1,
        )[:h, :w].astype(np.float64)
        r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0, 255)
        g = np.clip(
            np.floor(
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5
            ),
            0, 255,
        )
        b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0, 255)
        rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
        return PngImage("RGB", (w, h), rgb.tobytes())


class Y4MVideo:
    """Parsed stream: header facts + a frame generator. Also the
    PyAV-container-shaped object (context manager + decode())."""

    def __init__(self, payload: bytes):
        if not payload.startswith(_MAGIC + b" "):
            raise ValueError(
                "not a Y4M stream (bad YUV4MPEG2 magic) — y4m_stdlib "
                "decodes Y4M only; install PyAV for compressed video"
            )
        nl = payload.find(b"\n")
        if nl < 0:
            raise ValueError("corrupt Y4M: unterminated stream header")
        self._body = payload[nl + 1 :]
        w = h = num = den = None
        space = b"420jpeg"  # the spec default
        for tok in payload[len(_MAGIC) + 1 : nl].split(b" "):
            if not tok:
                continue
            key, val = tok[:1], tok[1:]
            if key == b"W":
                w = int(val)
            elif key == b"H":
                h = int(val)
            elif key == b"F":
                num, den = (int(x) for x in val.split(b":"))
            elif key == b"C":
                space = val
            elif key == b"I" and val not in (b"p", b"?"):
                raise NotImplementedError(
                    f"y4m_stdlib decodes progressive streams only "
                    f"(I{val.decode()})"
                )
            # A (aspect) and X (extensions) are informational
        if not w or not h or not num or not den:
            raise ValueError("corrupt Y4M: missing W/H/F header fields")
        if space not in _SPACES:
            raise NotImplementedError(
                f"y4m_stdlib: colorspace C{space.decode()} unsupported"
            )
        sub = _SPACES[space]
        if sub is not None and (w % sub[0] or h % sub[1]):
            raise ValueError(
                f"corrupt Y4M: {w}x{h} not divisible by C{space.decode()}"
                f" subsampling"
            )
        self.width, self.height = w, h
        self.fps_num, self.fps_den = num, den
        self.colorspace = space.decode()
        self._sub = sub

    # --- PyAV-container-shaped surface
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def decode(self, video: int = 0):
        """Yield Y4MFrame per FRAME chunk (video=0 mirrors PyAV)."""
        w, h, sub = self.width, self.height, self._sub
        ysz = w * h
        csz = 0 if sub is None else (w // sub[0]) * (h // sub[1])
        body = self._body
        pos = 0
        idx = 0
        while pos < len(body):
            if body[pos : pos + 5] != b"FRAME":
                raise ValueError(
                    f"corrupt Y4M: expected FRAME header at byte {pos}"
                )
            nl = body.find(b"\n", pos)
            if nl < 0:
                raise ValueError("corrupt Y4M: unterminated FRAME header")
            start = nl + 1
            need = ysz + 2 * csz
            raw = body[start : start + need]
            if len(raw) != need:
                raise ValueError(
                    f"corrupt Y4M: frame {idx} truncated "
                    f"({len(raw)}/{need} bytes)"
                )
            y = np.frombuffer(raw[:ysz], np.uint8).reshape(h, w)
            if sub is None:
                u = v = None
            else:
                cw, chh = w // sub[0], h // sub[1]
                u = np.frombuffer(
                    raw[ysz : ysz + csz], np.uint8
                ).reshape(chh, cw)
                v = np.frombuffer(
                    raw[ysz + csz :], np.uint8
                ).reshape(chh, cw)
            yield Y4MFrame(idx, y, u, v, self.fps_num, self.fps_den)
            idx += 1
            pos = start + need


def encode_y4m(
    size: "tuple[int, int]",
    frames,
    fps: "tuple[int, int]" = (25, 1),
    colorspace: str = "420jpeg",
) -> bytes:
    """The encoder dual: frames is an iterable of (y, u, v) uint8
    plane triples (u/v None for mono) at the declared subsampling."""
    w, h = int(size[0]), int(size[1])
    space = colorspace.encode()
    if space not in _SPACES:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    sub = _SPACES[space]
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(
            f"{w}x{h} not divisible by C{colorspace} subsampling"
        )
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (w, h, fps[0], fps[1], space)
    )
    for y, u, v in frames:
        y = np.asarray(y, np.uint8)
        if y.shape != (h, w):
            raise ValueError(f"Y plane {y.shape} != {(h, w)}")
        out += b"FRAME\n" + y.tobytes()
        if sub is None:
            if u is not None or v is not None:
                raise ValueError("mono frames must not carry chroma")
            continue
        cw, chh = w // sub[0], h // sub[1]
        for p in (u, v):
            p = np.asarray(p, np.uint8)
            if p.shape != (chh, cw):
                raise ValueError(f"chroma plane {p.shape} != {(chh, cw)}")
            out += p.tobytes()
    return bytes(out)


def open(fp) -> Y4MVideo:  # noqa: A001 - PyAV-shaped module surface
    """av.open-shaped entry point (reads the whole stream — payloads
    arrive as in-memory bytes from the Arrow batch)."""
    return Y4MVideo(fp.read())
