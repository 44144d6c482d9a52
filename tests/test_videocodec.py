"""Y4M codec spec conformance (the video analog of test_audiocodec /
test_imagecodec: pin the PUBLIC container layout, not just
self-consistency)."""

from __future__ import annotations

import pytest

from supabase_etl_spark.operators import videocodec as VC


def _frames(w, h, n, seed=5):
    out = []
    for f in range(n):
        y = bytes((seed + 3 * x + 5 * yy + 11 * f) % 256 for yy in range(h) for x in range(w))
        cb = bytes((seed + 7 * f + x) % 256 for yy in range(h) for x in range(w))
        cr = bytes((seed + 13 * f + yy) % 256 for yy in range(h) for x in range(w))
        out.append((y, cb, cr))
    return out


def test_header_layout_matches_spec():
    buf = VC.encode_y4m(4, 2, _frames(4, 2, 1), fps=(30, 1))
    header, rest = buf.split(b"\n", 1)
    assert header == b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 C444"
    assert rest.startswith(b"FRAME\n")
    # C444 frame payload = exactly 3 * w * h bytes after the marker
    assert len(rest) == len(b"FRAME\n") + 3 * 4 * 2


def test_roundtrip_identity():
    frames = _frames(8, 6, 5)
    w, h, fps, out = VC.decode_y4m(VC.encode_y4m(8, 6, frames))
    assert (w, h, fps) == (8, 6, (25, 1))
    assert out == frames


def test_decoder_tolerates_extra_header_and_frame_params():
    """Per spec, unknown header parameters (X tags) and per-frame
    parameter strings are legal; the parser must skip them."""
    frames = _frames(3, 3, 2)
    buf = VC.encode_y4m(3, 3, frames)
    patched = buf.replace(
        b" C444\n", b" C444 Xconverted-by=test\n", 1
    ).replace(b"FRAME\n", b"FRAME Ip\n", 1)
    w, h, _fps, out = VC.decode_y4m(patched)
    assert (w, h) == (3, 3)
    assert out == frames


def test_decoder_rejects_subsampled_and_garbage():
    buf = VC.encode_y4m(4, 4, _frames(4, 4, 1)).replace(b"C444", b"C420")
    with pytest.raises(ValueError, match="C444 only"):
        VC.decode_y4m(buf)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        VC.decode_y4m(b"RIFF not a video")
    truncated = VC.encode_y4m(4, 4, _frames(4, 4, 2))[:-5]
    with pytest.raises(ValueError, match="truncated"):
        VC.decode_y4m(truncated)


def test_plane_size_validation_on_encode():
    with pytest.raises(ValueError, match="plane size"):
        VC.encode_y4m(4, 4, [(b"short", b"x" * 16, b"y" * 16)])


def test_roundtrip_property_random_planes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=6),
        h=st.integers(min_value=1, max_value=6),
        n=st.integers(min_value=0, max_value=4),
        data=st.data(),
    )
    def check(w, h, n, data):
        plane = st.binary(min_size=w * h, max_size=w * h)
        frames = [
            (data.draw(plane), data.draw(plane), data.draw(plane)) for _ in range(n)
        ]
        got = VC.decode_y4m(VC.encode_y4m(w, h, frames))
        assert got == (w, h, (25, 1), frames)

    check()


def test_truncated_frame_header_raises_cleanly():
    """Stream ending in 'FRAME' with no trailing newline must raise a
    clean truncation error, not silently re-read from buffer start
    (buf.find returning -1 would slice buf[0:...])."""
    import pytest

    from supabase_etl_spark.operators import videocodec as V

    good = V.encode_y4m(2, 2, [(b"\x10" * 4, b"\x20" * 4, b"\x30" * 4)])
    trunc = good[: good.rindex(b"FRAME") + 5]  # ends exactly at 'FRAME'
    with pytest.raises(ValueError, match="truncated FRAME header"):
        V.decode_y4m(trunc)
