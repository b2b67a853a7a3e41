"""Ogg framing + Ogg-FLAC mapping: page CRC, lacing reassembly,
continuation pages, round-trips through the real FLAC layer, sniffer."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moosestack_spark.ops.ogg import (
    decode_ogg_flac,
    encode_ogg_flac,
    ogg_crc,
    parse_ogg,
    write_ogg,
)


def _sig(n, ch=1, seed=3):
    rng = np.random.RandomState(seed)
    base = (rng.randint(-1500, 1500, (n, ch))).astype(np.int16)
    return base[:, 0] if ch == 1 else base


def test_ogg_crc_known_vector():
    # CRC of 'OggS' under poly 0x04C11DB7 non-reflected, init/xorout 0 —
    # value pinned by this implementation and cross-checked by the page
    # round-trip tests (parse_ogg verifies every page CRC)
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x00") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7


def test_page_roundtrip_packets():
    pkts = [b"alpha", b"", b"x" * 255, b"y" * 510, b"z" * 1000]
    data = write_ogg([(p, i) for i, p in enumerate(pkts)])
    assert parse_ogg(data) == pkts


def test_large_packet_continuation_pages():
    big = bytes(range(256)) * 300  # 76800 bytes > 255*255 -> continuation
    data = write_ogg([(big, 0)])
    assert parse_ogg(data) == [big]
    # more than one page emitted, continuation flag set on follow-ons
    assert data.count(b"OggS") >= 2


def test_crc_detects_corruption():
    data = bytearray(write_ogg([(b"payload", 0)]))
    data[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(data))


def test_ogg_flac_roundtrip_mono_and_stereo():
    mono = _sig(2000)
    data = encode_ogg_flac(mono, rate=8000, block_size=512,
                           modes=("fixed2", "verbatim", "lpc2", "fixed1"))
    out, rate = decode_ogg_flac(data)
    assert rate == 8000
    assert np.array_equal(out[:, 0], mono)

    stereo = _sig(1500, ch=2, seed=9)
    data2 = encode_ogg_flac(stereo, rate=22050, block_size=256, mid_side=True)
    out2, rate2 = decode_ogg_flac(data2)
    assert rate2 == 22050
    assert np.array_equal(out2, stereo)


def test_sniffer_routes_ogg_flac():
    from moosestack_spark.ops.multimodal import decode_wav

    mono = _sig(800, seed=5)
    samples, rate = decode_wav(encode_ogg_flac(mono, rate=16000, block_size=256))
    assert rate == 16000
    assert np.array_equal(samples, mono)


def test_vorbis_and_opus_raise_honestly():
    vorbis_pkt = b"\x01vorbis" + b"\x00" * 23
    data = write_ogg([(vorbis_pkt, 0)])
    with pytest.raises(NotImplementedError, match="Vorbis"):
        decode_ogg_flac(data)
    opus_pkt = b"OpusHead" + b"\x00" * 11
    data2 = write_ogg([(opus_pkt, 0)])
    with pytest.raises(NotImplementedError, match="Opus"):
        decode_ogg_flac(data2)


def test_bos_eos_flags():
    data = write_ogg([(b"first", 0), (b"last", 1)])
    # first page BOS (0x02), last page EOS (0x04)
    pages = []
    off = 0
    while off < len(data):
        n_segs = data[off + 26]
        body_len = sum(data[off + 27 : off + 27 + n_segs])
        pages.append(data[off + 5])
        off += 27 + n_segs + body_len
    assert pages[0] & 0x02 and not pages[0] & 0x04
    assert pages[-1] & 0x04 and not pages[-1] & 0x02


def test_native_flac_unchanged_by_parts_refactor():
    from moosestack_spark.ops.flac import decode_flac, encode_flac

    mono = _sig(1000, seed=11)
    data = encode_flac(mono, rate=16000, block_size=256,
                       modes=("fixed0", "fixed2", "lpc2"))
    out, rate = decode_flac(data)
    assert rate == 16000
    assert np.array_equal(out[:, 0], mono)


# ---- Vorbis / Opus metadata walk ----


def test_ogg_vorbis_metadata_walk():
    from moosestack_spark.ops.ogg import encode_ogg_vorbis_meta, ogg_stream_meta

    data = encode_ogg_vorbis_meta(
        44100 * 3 + 17, 44100, 2,
        {"TITLE": "t", "artist": "someone", "ALBUM": "a=b"},
        vendor="v1",
    )
    meta = ogg_stream_meta(data)
    assert meta["codec"] == "vorbis"
    assert meta["channels"] == 2
    assert meta["sample_rate"] == 44100
    assert meta["duration_ms"] == (44100 * 3 + 17) * 1000 // 44100
    assert meta["vendor"] == "v1"
    # field names are case-insensitive per spec; values keep '=' intact
    assert meta["tags"] == {"TITLE": "t", "ARTIST": "someone", "ALBUM": "a=b"}


def test_ogg_opus_metadata_walk_pre_skip():
    from moosestack_spark.ops.ogg import encode_ogg_opus_meta, ogg_stream_meta

    data = encode_ogg_opus_meta(48000 * 2, 1, {"TITLE": "x"}, pre_skip=312)
    meta = ogg_stream_meta(data)
    assert meta["codec"] == "opus"
    assert meta["channels"] == 1
    assert meta["sample_rate"] == 48000  # granule clock, not input rate
    # last granule = pre_skip + samples; duration excludes pre-skip
    assert meta["duration_ms"] == 2000
    assert meta["tags"]["TITLE"] == "x"


def test_ogg_flac_metadata_branch():
    import numpy as np

    from moosestack_spark.ops.ogg import encode_ogg_flac, ogg_stream_meta

    s = (np.sin(np.arange(16000) / 10) * 1000).astype(np.int16).reshape(-1, 1)
    data = encode_ogg_flac(s, rate=16000)
    meta = ogg_stream_meta(data)
    assert meta["codec"] == "flac"
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 1
    assert meta["duration_ms"] == 1000


def test_ogg_decode_still_refuses_lossy():
    import pytest as _pytest

    from moosestack_spark.ops.ogg import (
        decode_ogg_flac,
        encode_ogg_opus_meta,
        encode_ogg_vorbis_meta,
        sniff_is_ogg,
    )

    v = encode_ogg_vorbis_meta(1024, 48000, 1, {})
    o = encode_ogg_opus_meta(960, 1, {})
    assert sniff_is_ogg(v) and sniff_is_ogg(o)
    with _pytest.raises(NotImplementedError, match="Vorbis"):
        decode_ogg_flac(v)
    with _pytest.raises(NotImplementedError, match="Opus"):
        decode_ogg_flac(o)


def test_audio_metadata_sniffer_routes():
    """The unified audio_metadata router: Ogg (vorbis/opus), MP3, native
    FLAC STREAMINFO, RIFF/WAVE — and an honest raise on unknown bytes."""
    import numpy as np
    import pytest as _pytest

    from moosestack_spark.ops.flac import encode_flac
    from moosestack_spark.ops.mp3 import encode_mp3
    from moosestack_spark.ops.multimodal import audio_metadata, encode_wav_g711
    from moosestack_spark.ops.ogg import encode_ogg_opus_meta

    m = audio_metadata(encode_ogg_opus_meta(48000, 2, {"TITLE": "t"}))
    assert (m["codec"], m["channels"], m["duration_ms"]) == ("opus", 2, 1000)

    m = audio_metadata(encode_mp3(10, 9, 1, title="song"))
    assert m["codec"] == "mp3" and m["sample_rate"] == 48000
    assert m["tags"]["TITLE"] == "song"

    s = (np.sin(np.arange(32000) / 9) * 999).astype(np.int16).reshape(-1, 1)
    m = audio_metadata(encode_flac(s, rate=16000))
    assert (m["codec"], m["channels"], m["sample_rate"]) == ("flac", 1, 16000)
    assert m["duration_ms"] == 2000

    m = audio_metadata(
        encode_wav_g711(np.zeros(8000, dtype=np.uint8), 8000, "mulaw")
    )
    assert (m["codec"], m["sample_rate"], m["duration_ms"]) == (
        "mulaw", 8000, 1000,
    )

    with _pytest.raises(NotImplementedError, match="audio container"):
        audio_metadata(b"\x00\x01\x02\x03 definitely not audio")
