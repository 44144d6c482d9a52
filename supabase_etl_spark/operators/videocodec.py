"""Pure-Python Y4M (YUV4MPEG2) codec — the video leg of the
multimodal column convention.

Same precedent as the Avro, PNG/BMP/PPM, and WAV codecs: no media
library ships in this runtime, so the PUBLIC container format is
implemented directly. YUV4MPEG2 is the uncompressed interchange format
mjpegtools defined and ffmpeg/x264 consume everywhere; it is also the
simplest real video container in existence, which makes it the honest
choice for exercising the video plumbing with actual parsed frames
instead of stand-ins:

    "YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C444\\n"   stream header
    "FRAME\\n" + Y-plane + Cb-plane + Cr-plane             per frame

C444 keeps every plane w×h bytes (no chroma subsampling), so frame
payloads are exactly 3·w·h and the decoder is pure arithmetic. The
parser tolerates extra header parameters (X metadata tags) and
per-frame parameter strings after FRAME, per spec.
"""

from __future__ import annotations


def encode_y4m(
    w: int, h: int, frames: list[tuple[bytes, bytes, bytes]], fps: tuple[int, int] = (25, 1)
) -> bytes:
    """frames: list of (Y, Cb, Cr) planes, each exactly w*h bytes."""
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()
    )
    for y, cb, cr in frames:
        if len(y) != w * h or len(cb) != w * h or len(cr) != w * h:
            raise ValueError("plane size mismatch")
        out += b"FRAME\n" + y + cb + cr
    return bytes(out)


def decode_y4m(buf: bytes) -> tuple[int, int, tuple[int, int], list[tuple[bytes, bytes, bytes]]]:
    """→ (w, h, (fps_num, fps_den), frames). C444 only — anything else
    raises loudly (subsampled layouts change plane sizes)."""
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    colorspace = "C420jpeg"  # the spec default when C is absent
    for tok in buf[9:nl].split():
        t = tok.decode()
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps = (int(num), int(den))
        elif t.startswith("C"):
            colorspace = t
        # Ip/A/X... tolerated and ignored
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    if colorspace != "C444":
        raise ValueError(f"unsupported colorspace {colorspace} (C444 only)")
    plane = w * h
    frames = []
    pos = nl + 1
    while pos < len(buf):
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = buf.find(b"\n", pos)  # frame params (if any) end at newline
        if fnl < 0:
            # stream ends inside the FRAME header: without this guard,
            # buf[fnl+1:] == buf[0:] silently re-reads from the start
            # of the buffer and yields a garbage frame
            raise ValueError("truncated FRAME header")
        data = buf[fnl + 1 : fnl + 1 + 3 * plane]
        if len(data) < 3 * plane:
            raise ValueError("truncated frame payload")
        frames.append((data[:plane], data[plane : 2 * plane], data[2 * plane :]))
        pos = fnl + 1 + 3 * plane
    return w, h, fps, frames
