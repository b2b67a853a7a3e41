"""MJPEG-in-AVI container walk + frame decode (ops/avi.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moosestack_spark.ops.avi import (
    avi_stream_meta,
    encode_avi_mjpeg,
    parse_avi,
    sample_avi_frames,
    sniff_is_avi,
)
from moosestack_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _flat(v: int, gray: bool = False) -> bytes:
    px = np.full((16, 16) if gray else (16, 16, 3), v, dtype=np.uint8)
    return encode_jpeg(px)


def test_roundtrip_frames_and_meta():
    frames = [_flat(v) for v in (0, 77, 200, 255)]
    avi = encode_avi_mjpeg(frames, 16, 16, rate=25, scale=1)
    assert sniff_is_avi(avi)
    p = parse_avi(avi)
    assert (p["width"], p["height"], p["rate"], p["scale"]) == (16, 16, 25, 1)
    assert p["n_frames"] == 4
    for orig, got in zip(frames, p["frames"]):
        assert got == orig  # container must not touch the JPEG bytes
    for v, f in zip((0, 77, 200, 255), p["frames"]):
        assert int(decode_jpeg(f)[0, 0, 0]) == v
    meta = avi_stream_meta(avi)
    assert meta["codec"] == "mjpeg"
    assert meta["duration_ms"] == 4 * 1000 // 25


def test_odd_length_frame_padding():
    # JPEG bytes of odd length exercise the RIFF even-padding rule
    frames = [_flat(3, gray=True)]
    if len(frames[0]) % 2 == 0:
        # force an odd payload by appending a comment segment of odd size
        frames = [frames[0][:-2] + b"\xff\xfe\x00\x03a" + b"\xff\xd9"]
    assert len(frames[0]) % 2 == 1
    p = parse_avi(encode_avi_mjpeg(frames, 16, 16, rate=4))
    assert p["frames"][0] == frames[0]


def test_non_mjpeg_handler_refused():
    avi = bytearray(encode_avi_mjpeg([_flat(1)], 16, 16, rate=4))
    i = avi.find(b"vids") + 4
    avi[i : i + 4] = b"XVID"
    j = avi.find(b"MJPG", i + 4)  # biCompression in strf
    avi[j : j + 4] = b"XVID"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        parse_avi(bytes(avi))


def test_truncated_and_garbage_refused():
    avi = encode_avi_mjpeg([_flat(1)], 16, 16, rate=4)
    with pytest.raises(ValueError):
        parse_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError):
        parse_avi(avi[:40])  # header cut mid-hdrl
    # frame-count lie in strh must be caught
    bad = bytearray(avi)
    i = bad.find(b"vids")
    # dwLength is at offset 32 into the strh body (after the two fourccs,
    # dwFlags, wPriority+wLanguage, dwInitialFrames, dwScale, dwRate, dwStart)
    struct.pack_into("<I", bad, i + 32, 9)
    with pytest.raises(ValueError, match="movi carries"):
        parse_avi(bytes(bad))


def test_sample_avi_frames_kernel(spark):
    rows = []
    for mid in (0, 1):
        frames = [
            _flat((mid * 7 + i * 13) % 256, gray=bool(mid % 2))
            for i in range(4)
        ]
        rows.append((mid, encode_avi_mjpeg(frames, 16, 16, rate=4, scale=1)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_avi_frames(df, every_ms=300).toPandas()
    # duration 1000ms, samples at 0,300,600,900 -> idx 0,1,2,3
    assert len(out) == 8
    for _, r in out.iterrows():
        v = (r.media_id * 7 + r.frame_idx * 13) % 256
        assert r.mean_r == r.mean_g == r.mean_b == float(v)
        assert r.frame_idx == min(r.frame_ms * 4 // 1000, 3)


def test_video_metadata_sniffer_routes():
    from moosestack_spark.ops.multimodal import (
        encode_minimal_mp4,
        video_metadata,
    )

    avi_meta = video_metadata(encode_avi_mjpeg([_flat(9)], 16, 16, rate=10))
    assert avi_meta["codec"] == "mjpeg" and avi_meta["n_frames"] == 1
    mp4 = encode_minimal_mp4(duration_ms=1500, width=32, height=16)
    mp4_meta = video_metadata(mp4)
    assert mp4_meta["codec"] == "mp4" and mp4_meta["duration_ms"] == 1500
    with pytest.raises(ValueError, match="unrecognized video container"):
        video_metadata(b"\x00" * 32)


def test_interleaved_audio_stream_skipped():
    """A leading 'auds' stream must not confuse the walk: the vids stream
    is stream 1, so frames live in '01dc' chunks and '00wb' audio chunks
    are ignored."""
    import struct as _s

    from moosestack_spark.ops.avi import _chunk, _list, parse_avi

    frames = [_flat(40), _flat(200)]
    auds_strh = (
        b"auds" + b"\x00" * 4
        + _s.pack("<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 16000, 0, 320, 0, 0, 2,
                  0, 0, 0, 0)
    )
    auds_strf = _s.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)  # PCM fmt
    vids_strh = (
        b"vids" + b"MJPG"
        + _s.pack("<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 5, 0, len(frames),
                  max(len(f) for f in frames), 10000, 0, 0, 0, 16, 16)
    )
    vids_strf = _s.pack("<IiiHH4sIiiII", 40, 16, 16, 1, 24, b"MJPG",
                        16 * 16 * 3, 0, 0, 0, 0)
    avih = _s.pack("<14I", 200000, 0, 0, 0x10, len(frames), 0, 2,
                   max(len(f) for f in frames), 16, 16, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", auds_strh) + _chunk(b"strf", auds_strf))
        + _list(b"strl", _chunk(b"strh", vids_strh) + _chunk(b"strf", vids_strf)),
    )
    movi_body = b""
    for i, f in enumerate(frames):
        movi_body += _chunk(b"00wb", b"\x01\x02" * 160)  # audio chunk
        movi_body += _chunk(b"01dc", f)                      # video frame
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + _s.pack("<I", len(body)) + body
    p = parse_avi(avi)
    assert p["n_frames"] == 2 and p["rate"] == 5
    assert p["frames"] == frames


def test_gif_animation_compositing():
    import numpy as np

    from moosestack_spark.ops.gif import (
        decode_gif_frames,
        encode_gif_animation,
        gif_animation_meta,
    )

    frames = [
        dict(idx=np.zeros((16, 16), np.uint8),
             ct=np.array([[10, 20, 30]], np.uint8),
             x=0, y=0, delay_cs=25, disposal=1),
        dict(idx=np.zeros((8, 8), np.uint8),
             ct=np.array([[200, 0, 0]], np.uint8),
             x=8, y=0, delay_cs=50, disposal=1),
    ]
    data = encode_gif_animation(frames, (16, 16))
    fs = decode_gif_frames(data)
    assert [f["delay_cs"] for f in fs] == [25, 50]
    assert (fs[0]["pixels"] == [10, 20, 30]).all()
    # frame 1 composites the red patch over the top-right quadrant only
    assert (fs[1]["pixels"][0:8, 8:16] == [200, 0, 0]).all()
    assert (fs[1]["pixels"][8:16, :] == [10, 20, 30]).all()
    meta = gif_animation_meta(data)
    assert meta["n_frames"] == 2 and meta["duration_ms"] == 750


def test_gif_transparency_and_disposal2():
    import numpy as np
    import pytest

    from moosestack_spark.ops.gif import decode_gif_frames, encode_gif_animation

    base = dict(idx=np.zeros((8, 8), np.uint8),
                ct=np.array([[50, 50, 50]], np.uint8),
                x=0, y=0, delay_cs=10, disposal=1)
    # transparent patch: index 1 marked transparent -> prior canvas shows
    patch_idx = np.zeros((8, 8), np.uint8)
    patch_idx[:, 4:] = 1
    transparent = dict(idx=patch_idx,
                       ct=np.array([[255, 0, 0], [9, 9, 9]], np.uint8),
                       x=0, y=0, delay_cs=10, disposal=2,
                       transparent_idx=1)
    after = dict(idx=np.zeros((4, 4), np.uint8),
                 ct=np.array([[0, 0, 255]], np.uint8),
                 x=0, y=0, delay_cs=10, disposal=0)
    fs = decode_gif_frames(
        encode_gif_animation([base, transparent, after], (8, 8))
    )
    assert (fs[1]["pixels"][:, :4] == [255, 0, 0]).all()
    assert (fs[1]["pixels"][:, 4:] == [50, 50, 50]).all()  # transparency
    # disposal 2 restored the rect to white before frame 3's small patch
    assert (fs[2]["pixels"][:4, :4] == [0, 0, 255]).all()
    assert (fs[2]["pixels"][4:, :] == 255).all()
    # disposal 3 refused loudly
    bad = dict(base, disposal=3)
    with pytest.raises(NotImplementedError, match="disposal 3"):
        decode_gif_frames(encode_gif_animation([bad, base], (8, 8)))


def test_motion_sampler_routes_mixed_payloads(spark):
    import numpy as np

    from moosestack_spark.ops.avi import encode_avi_mjpeg, sample_motion_frames
    from moosestack_spark.ops.gif import encode_gif_animation

    avi = encode_avi_mjpeg([_flat(30), _flat(60)], 16, 16, rate=4)
    gif = encode_gif_animation(
        [dict(idx=np.zeros((16, 16), np.uint8),
              ct=np.array([[77] * 3], np.uint8),
              x=0, y=0, delay_cs=25, disposal=1),
         dict(idx=np.zeros((16, 16), np.uint8),
              ct=np.array([[99] * 3], np.uint8),
              x=0, y=0, delay_cs=25, disposal=1)],
        (16, 16),
    )
    df = spark.createDataFrame(
        [(0, avi), (1, gif)], "media_id long, payload binary"
    )
    out = sample_motion_frames(df, every_ms=250).toPandas()
    m = {(r.media_id, r.frame_idx): r.mean_r for _, r in out.iterrows()}
    assert m[(0, 0)] == 30.0 and m[(0, 1)] == 60.0
    assert m[(1, 0)] == 77.0 and m[(1, 1)] == 99.0
    import pytest

    bad = spark.createDataFrame(
        [(2, b"\x00" * 64)], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="unrecognized motion payload"):
        sample_motion_frames(bad, every_ms=100).collect()


def test_zero_rate_or_scale_refused():
    """rate=0 would ZeroDivisionError in the frame samplers and scale=0
    would silently sample nothing — both must refuse at parse time, the
    same loud-ValueError boundary as the other malformed containers."""
    avi = encode_avi_mjpeg([_flat(1)], 16, 16, rate=4)
    i = avi.find(b"vids")
    # strh body layout from 'vids': dwScale at +20, dwRate at +24
    for off in (20, 24):
        bad = bytearray(avi)
        struct.pack_into("<I", bad, i + off, 0)
        with pytest.raises(ValueError, match="rate/scale"):
            parse_avi(bytes(bad))
