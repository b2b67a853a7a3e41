"""RIFF/AVI container walk + MJPEG (motion-JPEG) frame decode.

Real video frames without ffmpeg: MJPEG stores each frame as a complete
baseline JPEG inside a RIFF/AVI container, so the repo's own JPEG decoder
(ops/jpeg.py) covers the codec and the only new surface is the container —
the classic Microsoft RIFF AVI layout (public spec: the AVI RIFF File
Reference / OpenDML AVI File Format Extensions):

    RIFF('AVI '
      LIST('hdrl' avih LIST('strl' strh strf))
      LIST('movi' '00dc' <jpeg> '00dc' <jpeg> ...)
      idx1)

This upgrades the multimodal family's last synthetic output
(sample_video_frames' ``frame_stub``): ``sample_avi_frames`` emits REAL
per-frame channel means at sampled timestamps, sniffer-routed by the RIFF
magic.  Non-MJPEG codecs (the fccHandler says DIB/XVID/H264/...) are an
honest loud boundary — frame DSP for those needs ffmpeg, which this
container walk deliberately does not.

Scale notes (100 TB): payload bytes are read once inside an Arrow
mapInPandas kernel and never shuffled; the per-timestamp explode happens
inside the kernel so only the (media_id, frame_ms, means) rows leave the
executor.  Within one payload, decoded frames are cached by frame index so
sampling twice from the same frame never decodes twice.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, rate: int, scale: int = 1
) -> bytes:
    """Wrap pre-encoded baseline-JPEG frames into a spec-shaped AVI:
    one 'vids'/'MJPG' stream, frame rate = rate/scale fps, '00dc' movi
    chunks, and a keyframe idx1 (every MJPEG frame is a keyframe)."""
    if not frames:
        raise ValueError("at least one frame required")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("frame payload is not a JPEG (no SOI marker)")
    max_len = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 * scale // rate,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_len,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            scale,
            rate,
            0,  # dwStart
            len(frames),  # dwLength (in frames)
            max_len,  # dwSuggestedBufferSize
            10_000,  # dwQuality
            0,  # dwSampleSize (0 = variable)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    offsets: list[tuple[int, int]] = []  # (offset from 'movi' fourcc, length)
    for f in frames:
        offsets.append((4 + len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)  # AVIIF_KEYFRAME
            for off, ln in offsets
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def sniff_is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_start, body_len) over a chunk run, honoring the
    even-byte padding rule."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at {pos} overruns its parent "
                f"({body + size} > {end})"
            )
        yield fourcc, body, size
        pos = body + size + (size % 2)


def parse_avi(data: bytes) -> dict:
    """Strict RIFF/AVI walk.  Returns
    {width, height, rate, scale, n_frames, frames: [jpeg bytes, ...]}.

    Boundaries kept loud: a 'vids' stream whose handler/compression is not
    MJPG raises NotImplementedError (DSP for other codecs needs ffmpeg);
    missing avih/strh/movi raise ValueError; every frame chunk must carry
    a JPEG SOI marker."""
    if not sniff_is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    avih = None
    vids: dict | None = None
    stream_no = -1
    frames: list[bytes] = []
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue  # idx1/JUNK are advisory; the movi walk is authoritative
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            for c4, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if c4 == b"avih":
                    avih = struct.unpack_from("<14I", data, b2)
                elif c4 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    stream_no += 1
                    strh = strf = None
                    for c5, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                        if c5 == b"strh":
                            strh = (data[b3 : b3 + 4], data[b3 + 4 : b3 + 8],
                                    struct.unpack_from("<IHHIIIIIIII", data, b3 + 8))
                        elif c5 == b"strf":
                            strf = data[b3 : b3 + s3]
                    if strh and strh[0] == b"vids" and vids is None:
                        handler = strh[1]
                        compression = strf[16:20] if strf and len(strf) >= 20 else b""
                        if handler not in (b"MJPG", b"mjpg") and compression not in (
                            b"MJPG", b"mjpg",
                        ):
                            raise NotImplementedError(
                                f"video codec {handler!r}/{compression!r}: only "
                                "MJPEG-in-AVI is decodable without ffmpeg"
                            )
                        fields = strh[2]
                        # strict container check (same loud-ValueError
                        # convention as the other malformed-AVI cases):
                        # rate=0 would ZeroDivisionError in the frame
                        # samplers, scale=0 would silently sample nothing
                        if fields[4] == 0 or fields[5] == 0:
                            raise ValueError(
                                "malformed AVI: vids strh rate/scale must "
                                f"be nonzero (scale={fields[4]}, "
                                f"rate={fields[5]})"
                            )
                        vids = {
                            "stream_no": stream_no,
                            "scale": fields[4],
                            "rate": fields[5],
                            "n_frames": fields[7],
                        }
        elif ltype == b"movi":
            if vids is None:
                raise ValueError("movi list before any vids stream header")
            want = (
                f"{vids['stream_no']:02d}dc".encode(),
                f"{vids['stream_no']:02d}db".encode(),
            )
            for c4, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if c4 in want:
                    frame = data[b2 : b2 + s2]
                    if frame[:2] != b"\xff\xd8":
                        raise ValueError(
                            f"frame chunk at {b2} lacks a JPEG SOI marker"
                        )
                    frames.append(frame)
    if avih is None or vids is None:
        raise ValueError("missing avih/vids stream header")
    if not frames:
        raise ValueError("no frame chunks in movi list")
    if vids["n_frames"] and vids["n_frames"] != len(frames):
        raise ValueError(
            f"strh.dwLength says {vids['n_frames']} frames, movi carries "
            f"{len(frames)}"
        )
    return {
        "width": avih[8],
        "height": avih[9],
        "rate": vids["rate"],
        "scale": vids["scale"],
        "n_frames": len(frames),
        "frames": frames,
    }


def avi_stream_meta(data: bytes) -> dict:
    """Container metadata only (no frame decode): width/height/fps/frames/
    duration_ms — the video branch of the unified media sniffer."""
    p = parse_avi(data)
    return {
        "codec": "mjpeg",
        "width": p["width"],
        "height": p["height"],
        "rate": p["rate"],
        "scale": p["scale"],
        "n_frames": p["n_frames"],
        "duration_ms": p["n_frames"] * 1000 * p["scale"] // p["rate"],
    }


AVI_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("mean_r", DoubleType(), False),
        StructField("mean_g", DoubleType(), False),
        StructField("mean_b", DoubleType(), False),
    ]
)


def sample_avi_frames(
    df: DataFrame,
    every_ms: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL frame sampling over MJPEG-in-AVI payloads: per media, sample
    timestamps 0, every_ms, 2*every_ms, ... < duration, map each to its
    frame (idx = floor(ms * rate / (1000 * scale)), clamped), decode the
    JPEG, and emit exact per-channel means (integer pixel sum / pixel
    count — bit-identical across engines).  Grayscale frames broadcast
    their single channel to r=g=b, matching the JPEG luma semantics.
    Decoded frames are cached per payload so repeated hits on one frame
    decode once."""
    from moosestack_spark.ops.jpeg import decode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AVI_FRAME_SCHEMA}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                parsed = parse_avi(bytes(p))
                n = parsed["n_frames"]
                rate, scale = parsed["rate"], parsed["scale"]
                duration_ms = n * 1000 * scale // rate
                cache: dict[int, np.ndarray] = {}
                for ms in range(0, duration_ms, every_ms):
                    idx = min(ms * rate // (1000 * scale), n - 1)
                    if idx not in cache:
                        px = decode_jpeg(parsed["frames"][idx])
                        if px.ndim == 2:
                            px = np.repeat(px[:, :, None], 3, axis=2)
                        cache[idx] = px
                    px = cache[idx]
                    npix = px.shape[0] * px.shape[1]
                    out["media_id"].append(int(mid))
                    out["frame_ms"].append(ms)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(n)
                    for j, ch in enumerate(("mean_r", "mean_g", "mean_b")):
                        out[ch].append(
                            float(int(px[:, :, j].sum(dtype=np.int64))) / npix
                        )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_ms": pd.Series(out["frame_ms"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, AVI_FRAME_SCHEMA)


def _register_gate_queries() -> None:
    from pyspark.sql import SparkSession  # noqa: F401
    from pyspark.sql import functions as F

    from moosestack_spark.registry import query

    @query(
        "multimodal_avi_frames",
        oracle="""
WITH vid AS (
  SELECT doc_id, CAST(3 + doc_id % 4 AS BIGINT) AS n
  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 400
),
s AS (
  SELECT doc_id, n,
         UNNEST(generate_series(0, n * 250 - 1, 400)) AS frame_ms
  FROM vid
),
f AS (
  SELECT doc_id, n, frame_ms,
         LEAST(frame_ms // 250, n - 1) AS frame_idx
  FROM s
)
SELECT doc_id AS media_id, frame_ms,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(n AS INTEGER) AS n_frames,
       CAST((doc_id * 7 + frame_idx * 13) % 256 AS DOUBLE) AS mean_r,
       CAST((doc_id * 7 + frame_idx * 13) % 256 AS DOUBLE) AS mean_g,
       CAST((doc_id * 7 + frame_idx * 13) % 256 AS DOUBLE) AS mean_b
FROM f
""",
    )
    def multimodal_avi_frames(spark, sf_dir: str) -> DataFrame:
        """REAL MJPEG-in-AVI frame sampling end-to-end: per video doc an
        AVI is planted whose frame i is a FLAT gray JPEG of value
        (doc_id*7 + i*13) % 256 — flat frames are chosen because the
        near-lossless baseline roundtrip is pixel-exact for them (verified
        for all 256 values), which makes the full container-walk →
        frame-select → Huffman+IDCT decode → channel-mean pipeline
        SQL-replayable.  Docs alternate RGB and grayscale JPEG frames so
        both decoder paths run.  4 fps (250 ms/frame), sampled every
        400 ms; the oracle replays the timestamp→frame-index arithmetic
        and the planted values."""
        from moosestack_spark.ops.jpeg import encode_jpeg
        from moosestack_spark.tables import t as _t

        d = _t(spark, sf_dir, "documents").select("doc_id").filter(
            (F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 400)
        )

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, payloads = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n = 3 + did % 4
                    frames = []
                    for i in range(n):
                        v = (did * 7 + i * 13) % 256
                        if did % 2 == 0:
                            px = np.full((16, 16, 3), v, dtype=np.uint8)
                        else:
                            px = np.full((16, 16), v, dtype=np.uint8)
                        frames.append(encode_jpeg(px))
                    ids.append(did)
                    payloads.append(
                        encode_avi_mjpeg(frames, 16, 16, rate=4, scale=1)
                    )
                yield pd.DataFrame({"media_id": ids, "payload": payloads})

        media = d.mapInPandas(
            build, "media_id long, payload binary"
        )
        return sample_avi_frames(media, every_ms=400)


_register_gate_queries()


def sample_motion_frames(
    df: DataFrame,
    every_ms: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Sniffer-routed frame sampling over MIXED motion payloads: RIFF/AVI
    goes through the MJPEG walk, GIF through the animation compositor
    (ops/gif.py decode_gif_frames — variable per-frame delays honored);
    anything else raises loudly inside the kernel.  Output schema is
    AVI_FRAME_SCHEMA for both containers."""
    from moosestack_spark.ops.gif import decode_gif_frames
    from moosestack_spark.ops.jpeg import decode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AVI_FRAME_SCHEMA}

            def emit(mid, ms, idx, n, px):
                npix = px.shape[0] * px.shape[1]
                out["media_id"].append(int(mid))
                out["frame_ms"].append(ms)
                out["frame_idx"].append(idx)
                out["n_frames"].append(n)
                for j, ch in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[ch].append(
                        float(int(px[:, :, j].sum(dtype=np.int64))) / npix
                    )

            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                if sniff_is_avi(p):
                    parsed = parse_avi(p)
                    n = parsed["n_frames"]
                    rate, scale = parsed["rate"], parsed["scale"]
                    duration_ms = n * 1000 * scale // rate
                    cache: dict[int, np.ndarray] = {}
                    for ms in range(0, duration_ms, every_ms):
                        idx = min(ms * rate // (1000 * scale), n - 1)
                        if idx not in cache:
                            px = decode_jpeg(parsed["frames"][idx])
                            if px.ndim == 2:
                                px = np.repeat(px[:, :, None], 3, axis=2)
                            cache[idx] = px
                        emit(mid, ms, idx, n, cache[idx])
                elif p[:6] in (b"GIF87a", b"GIF89a"):
                    frames = decode_gif_frames(p)
                    n = len(frames)
                    starts = []
                    t = 0
                    for f in frames:
                        starts.append(t)
                        t += f["delay_cs"] * 10
                    duration_ms = t
                    for ms in range(0, duration_ms, every_ms):
                        idx = max(
                            i for i, s in enumerate(starts) if s <= ms
                        )
                        emit(mid, ms, idx, n, frames[idx]["pixels"])
                else:
                    raise ValueError(
                        "unrecognized motion payload (not AVI or GIF)"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_ms": pd.Series(out["frame_ms"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, AVI_FRAME_SCHEMA)


def _register_motion_gate() -> None:
    from pyspark.sql import functions as F

    from moosestack_spark.registry import query

    # per-quadrant last-paint arithmetic for the GIF composite (q = 0..3):
    # quadrant q is painted by frames j with (j-1) % 4 == q, value
    # (d*7 + 13*j) % 256; before any paint it holds frame 0's value.
    def _quad(q: int) -> str:
        return (
            f"CASE WHEN frame_idx >= {q + 1} THEN "
            f"CAST((doc_id * 7 + 13 * (frame_idx - "
            f"((frame_idx - {q + 1}) % 4))) % 256 AS DOUBLE) "
            f"ELSE CAST((doc_id * 7) % 256 AS DOUBLE) END"
        )

    _gif_mean = f"(({_quad(0)}) + ({_quad(1)}) + ({_quad(2)}) + ({_quad(3)})) / 4"

    @query(
        "multimodal_motion_frames",
        oracle=f"""
WITH vid AS (
  SELECT doc_id, CAST(3 + doc_id % 4 AS BIGINT) AS n
  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 400
),
s AS (
  SELECT doc_id, n,
         UNNEST(generate_series(0, n * 250 - 1, 400)) AS frame_ms
  FROM vid
),
f AS (
  SELECT doc_id, n, frame_ms,
         LEAST(frame_ms // 250, n - 1) AS frame_idx
  FROM s
),
m AS (
  SELECT doc_id, n, frame_ms, frame_idx,
         CASE WHEN doc_id % 2 = 0
              THEN CAST((doc_id * 7 + frame_idx * 13) % 256 AS DOUBLE)
              ELSE {_gif_mean} END AS mean
  FROM f
)
SELECT doc_id AS media_id, frame_ms,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(n AS INTEGER) AS n_frames,
       mean AS mean_r, mean AS mean_g, mean AS mean_b
FROM m
""",
    )
    def multimodal_motion_frames(spark, sf_dir: str) -> DataFrame:
        """Sniffer-routed frame sampling over a MIXED motion corpus: even
        video docs carry MJPEG-in-AVI (flat gray frames — pixel-exact
        through the near-lossless JPEG roundtrip), odd docs carry ANIMATED
        GIF whose frames after the first paint one 8x8 quadrant each
        (disposal 1, per-frame local color tables) — so the sampled means
        pin the full compositing walk: GCE delays, sub-rect placement,
        overwrite semantics.  GIF is lossless, so the oracle replays the
        quadrant last-paint arithmetic in closed form; both containers run
        at 250 ms/frame, sampled every 400 ms."""
        from moosestack_spark.ops.gif import encode_gif_animation
        from moosestack_spark.ops.jpeg import encode_jpeg
        from moosestack_spark.tables import t as _t

        d = _t(spark, sf_dir, "documents").select("doc_id").filter(
            (F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 400)
        )

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, payloads = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n = 3 + did % 4
                    if did % 2 == 0:
                        frames = []
                        for i in range(n):
                            v = (did * 7 + i * 13) % 256
                            frames.append(
                                encode_jpeg(np.full((16, 16, 3), v, np.uint8))
                            )
                        payload = encode_avi_mjpeg(frames, 16, 16, rate=4)
                    else:
                        gframes = []
                        v0 = (did * 7) % 256
                        gframes.append(dict(
                            idx=np.zeros((16, 16), np.uint8),
                            ct=np.array([[v0] * 3], np.uint8),
                            x=0, y=0, delay_cs=25, disposal=1,
                        ))
                        for j in range(1, n):
                            vj = (did * 7 + 13 * j) % 256
                            q = (j - 1) % 4
                            gframes.append(dict(
                                idx=np.zeros((8, 8), np.uint8),
                                ct=np.array([[vj] * 3], np.uint8),
                                x=(q % 2) * 8, y=(q // 2) * 8,
                                delay_cs=25, disposal=1,
                            ))
                        payload = encode_gif_animation(gframes, (16, 16))
                    ids.append(did)
                    payloads.append(payload)
                yield pd.DataFrame({"media_id": ids, "payload": payloads})

        media = d.mapInPandas(build, "media_id long, payload binary")
        return sample_motion_frames(media, every_ms=400)


_register_motion_gate()
