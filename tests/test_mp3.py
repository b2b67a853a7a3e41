"""MP3 container metadata (ops/mp3.py): ID3v2 parse, frame-sync walk,
exact duration arithmetic, VBR detection, sniffer, and the gate oracle.
"""

from __future__ import annotations

import struct

import pytest

from moosestack_spark.ops.mp3 import (
    encode_id3v2,
    encode_mp3,
    frame_length,
    parse_mp3_metadata,
    sniff_is_mp3,
)


def test_frame_length_spec_values():
    # 128 kbps @ 44100 Hz: 144*128000/44100 = 417.96 -> 417 (+1 padded)
    assert frame_length(9, 0) == 417
    assert frame_length(9, 0, padding=1) == 418
    # 320 kbps @ 32000 Hz: 144*320000/32000 = 1440 exactly
    assert frame_length(14, 2) == 1440


def test_cbr_roundtrip_with_id3():
    data = encode_mp3(25, 9, 0, title="hello world")
    meta = parse_mp3_metadata(data)
    assert meta == {
        "n_frames": 25,
        "sample_rate": 44100,
        "bitrate_kbps": 128,
        "duration_ms": 25 * 1152 * 1000 // 44100,
        "cbr": True,
        "title": "hello world",
    }


def test_padding_rule_walk():
    # alternating padding changes frame byte offsets; the walk must still
    # land on every sync word
    data = encode_mp3(16, 9, 0, padding_rule=lambda i: i % 2)
    meta = parse_mp3_metadata(data)
    assert meta["n_frames"] == 16
    assert meta["cbr"] is True


@pytest.mark.parametrize("bidx", range(1, 15))
@pytest.mark.parametrize("ridx", range(3))
def test_all_bitrate_rate_combinations(bidx, ridx):
    data = encode_mp3(7, bidx, ridx)
    meta = parse_mp3_metadata(data)
    assert meta["n_frames"] == 7
    from moosestack_spark.ops.mp3 import BITRATE_KBPS, SAMPLE_RATE

    assert meta["bitrate_kbps"] == BITRATE_KBPS[bidx]
    assert meta["sample_rate"] == SAMPLE_RATE[ridx]
    assert meta["duration_ms"] == 7 * 1152 * 1000 // SAMPLE_RATE[ridx]


def test_vbr_detection_and_mean_bitrate():
    # hand-build a two-bitrate stream: 128 kbps then 192 kbps frames
    a = encode_mp3(3, 9, 0)
    b = encode_mp3(3, 11, 0)
    meta = parse_mp3_metadata(a + b)
    assert meta["n_frames"] == 6
    assert meta["cbr"] is False
    assert meta["bitrate_kbps"] == (3 * 128 + 3 * 192) // 6


def test_id3_utf16_text_frame():
    payload = "détente".encode("utf-16")  # with BOM
    body = b"TIT2" + struct.pack(">I", 1 + len(payload)) + b"\x00\x00" + b"\x01" + payload
    tag = b"ID3\x03\x00\x00" + bytes(((len(body) >> s) & 0x7F) for s in (21, 14, 7, 0)) + body
    data = tag + encode_mp3(4, 9, 0)
    meta = parse_mp3_metadata(data)
    assert meta["title"] == "détente"
    assert meta["n_frames"] == 4


def test_no_title_is_none():
    assert parse_mp3_metadata(encode_mp3(4, 9, 0))["title"] is None


def test_rejects_no_sync():
    with pytest.raises(ValueError, match="no MPEG frame sync"):
        parse_mp3_metadata(b"\x00" * 64)
    # ID3 tag with no frames after it is also invalid
    with pytest.raises(ValueError, match="no MPEG frame sync"):
        parse_mp3_metadata(encode_id3v2({"TIT2": "x"}))


def test_rejects_rate_change_midstream():
    with pytest.raises(ValueError, match="sample-rate change"):
        parse_mp3_metadata(encode_mp3(2, 9, 0) + encode_mp3(2, 9, 1))


def test_rejects_mpeg2_and_bad_indexes():
    # MPEG-2 version bits (0b10) -> unsupported
    hdr = (0x7FF << 21) | (0b10 << 19) | (0b01 << 17) | (1 << 16) | (9 << 12)
    with pytest.raises(ValueError, match="unsupported MPEG header"):
        parse_mp3_metadata(struct.pack(">I", hdr) + b"\x00" * 400)
    # free-format bitrate index 0 -> unsupported
    hdr = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16) | (0 << 12)
    with pytest.raises(ValueError, match="unsupported MPEG header"):
        parse_mp3_metadata(struct.pack(">I", hdr) + b"\x00" * 400)


def test_sniffer_routes():
    assert sniff_is_mp3(encode_mp3(1, 9, 0))
    assert sniff_is_mp3(encode_id3v2({"TIT2": "t"}))
    assert not sniff_is_mp3(b"RIFF....WAVE")
    assert not sniff_is_mp3(b"fLaC")
    assert not sniff_is_mp3(b"\xff\xd8\xff\xe0")  # JPEG sync-ish but layer bits wrong
    assert not sniff_is_mp3(b"")


def test_gate_oracle_exact(spark, sf_dir):
    from moosestack_spark import registry
    from tests.oracle_harness import compare_query

    registry.load_all()
    name = "multimodal_mp3_metadata"
    ok, msg = compare_query(
        spark, name, registry.QUERIES[name], registry.ORACLES[name], sf_dir
    )
    assert ok, msg
