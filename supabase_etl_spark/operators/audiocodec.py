"""Pure-Python WAV (RIFF PCM) codec — the audio leg of the multimodal
column convention.

No audio library ships in this runtime, so — same precedent as
``io/avro_codec.py`` (Avro spec) and ``operators/imagecodec.py``
(PNG/BMP/PPM) — the public container format is implemented directly:
RIFF/WAVE per the Microsoft/IBM WAVE format spec (also RFC 2361's
WAVE registry): a little-endian RIFF container whose ``fmt `` chunk
declares PCM (audio format tag 1) and whose ``data`` chunk carries raw
interleaved samples. 16-bit signed mono is the profile used by the
fixtures; the decoder walks the chunk list properly (skipping unknown
chunks such as LIST/INFO, honoring the word-alignment pad byte), so it
reads real-world PCM WAV files, not just its own output.

Spec layout (all little-endian):

    offset 0  "RIFF"            4 bytes
           4  riff_size         u32  = file size - 8
           8  "WAVE"            4 bytes
    then a sequence of chunks:  id[4] size[u32] payload[size] (+pad)
      "fmt " payload: tag[u16]=1  channels[u16]  rate[u32]
                      byte_rate[u32]  block_align[u16]  bits[u16]
      "data" payload: samples, channel-interleaved
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """16-bit signed mono PCM → RIFF/WAVE bytes."""
    n = len(samples)
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WAVE bytes → (sample_rate, channels, samples).

    Walks the chunk list: tolerates extra chunks before/after ``data``
    (LIST, fact, ...) and the odd-size pad byte. Only PCM (tag 1) /
    16-bit is supported — anything else raises, loudly."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, 0
            )
            if tag != 1:
                raise ValueError(f"unsupported WAVE format tag {tag} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (16-bit only)")
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2]))
    return rate, channels, samples
