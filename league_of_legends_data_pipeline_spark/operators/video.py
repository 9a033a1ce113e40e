"""Vendored video-container plumbing: ISO BMFF (MP4) metadata extraction.

The video modality follows the same opaque-binary design as images and
audio: payloads are ``binary`` columns, and the vendored tier covers
what a container (not codec) walk can do for REAL — the ISO base media
file format's box structure is public (ISO/IEC 14496-12), and duration,
timescale, track count, and track dimensions live in plain header boxes
(``mvhd``/``tkhd``) that need no codec at all. Frame DECODE (H.264 et
al.) is exactly the part that needs a real media library; like
JPEG-progressive it falls outside the vendored tier — here that simply
means ``video_metadata`` answers the metadata questions and the
``frame_sample`` operator (``operators/multimodal.py``) remains the
payload-slicing plumbing a codec would plug into.

Box grammar: [size u32 BE][type 4cc][payload], size==1 → 64-bit
largesize follows, size==0 → box runs to EOF. ``mvhd``/``tkhd`` are
full boxes (version+flags) with v0 (u32 times) and v1 (u64 times)
layouts — both parsed. ``tkhd`` width/height are 16.16 fixed-point.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _boxes(raw: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: truncated box header")
        (size,) = struct.unpack_from(">I", raw, pos)
        btype = raw[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize")
            (size,) = struct.unpack_from(">Q", raw, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("mp4: box overruns container")
        yield btype, body, pos + size
        pos += size


def _full_box(raw: bytes, start: int):
    version = raw[start]
    return version, start + 4


def encode_mp4_stub(width: int, height: int, duration_ms: int,
                    timescale: int = 1000,
                    major_brand: bytes = b"isom") -> bytes:
    """Minimal structurally-valid MP4: ftyp + moov(mvhd, trak(tkhd)).
    No media data — this is the metadata fixture the parser tier is
    tested against, the way encode_png/encode_bmp24 are for images."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    duration = duration_ms * timescale // 1000
    matrix = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0,
                         0, 0, 0x40000000)
    mvhd = box(b"mvhd", struct.pack(">BBHIIIII", 0, 0, 0, 0, 0,
                                    timescale, duration, 0x00010000)
               + struct.pack(">HH", 0x0100, 0) + b"\x00" * 8
               + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = box(b"tkhd", struct.pack(">BBHIIIII", 0, 0, 7, 0, 0, 1, 0,
                                    duration)
               + b"\x00" * 8
               + struct.pack(">HHHH", 0, 0, 0, 0)
               + matrix
               + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", major_brand + struct.pack(">I", 0x200)
               + major_brand + b"mp41")
    return ftyp + moov


def parse_mp4_metadata(raw: bytes):
    """ISO BMFF metadata walk → dict(major_brand, timescale, duration_ms,
    n_tracks, width, height) from ftyp/mvhd/tkhd (first video-sized
    track wins for dims; 0x0-sized audio tracks are skipped). ``None``
    when the payload is not ISO BMFF (no ftyp); ``ValueError`` when the
    box structure is recognized but corrupt."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None
    out = {"major_brand": raw[8:12].decode("latin1"), "timescale": None,
           "duration_ms": None, "n_tracks": 0, "width": None,
           "height": None}
    for btype, b0, b1 in _boxes(raw, 0, len(raw)):
        if btype != b"moov":
            continue
        for ctype, c0, c1 in _boxes(raw, b0, b1):
            if ctype == b"mvhd":
                ver, p = _full_box(raw, c0)
                if ver == 1:
                    _, _, ts, dur = struct.unpack_from(">QQIQ", raw, p)
                else:
                    _, _, ts, dur = struct.unpack_from(">IIII", raw, p)
                if ts <= 0:
                    raise ValueError("mp4: bad mvhd timescale")
                out["timescale"] = ts
                out["duration_ms"] = dur * 1000 // ts
            elif ctype == b"trak":
                out["n_tracks"] += 1
                for ttype, t0, t1 in _boxes(raw, c0, c1):
                    if ttype != b"tkhd":
                        continue
                    ver, p = _full_box(raw, t0)
                    # v1: u64 create/modify + u32 id + u32 res + u64 dur
                    p += (32 if ver == 1 else 20) + 8 + 8  # -> matrix
                    p += 36
                    w16, h16 = struct.unpack_from(">II", raw, p)
                    w, h = w16 >> 16, h16 >> 16
                    if w and h and out["width"] is None:
                        out["width"], out["height"] = w, h
    if out["timescale"] is None:
        raise ValueError("mp4: ftyp without mvhd")
    return out


VIDEO_META_SCHEMA = ("id bigint, major_brand string, timescale int, "
                     "duration_ms bigint, n_tracks int, width int, "
                     "height int, error string")


def video_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """MP4 metadata extraction, Arrow-batched via ``mapInPandas`` (the
    ``decode_image`` pattern for the video modality). Non-BMFF payloads
    degrade to ``error='DecoderMissing'`` rows, corrupt box trees to
    ``error='DecodeError:...'`` — the P12 convention, no exceptions
    mid-pipeline."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(raw)
                try:
                    meta = parse_mp4_metadata(raw)
                except ValueError as exc:
                    rows.append((i, None, None, None, None, None, None,
                                 f"DecodeError:{exc}"))
                    continue
                if meta is None:
                    rows.append((i, None, None, None, None, None, None,
                                 "DecoderMissing"))
                    continue
                rows.append((i, meta["major_brand"], meta["timescale"],
                             meta["duration_ms"], meta["n_tracks"],
                             meta["width"], meta["height"], None))
            yield pd.DataFrame(
                rows, columns=["id", "major_brand", "timescale",
                               "duration_ms", "n_tracks", "width",
                               "height", "error"])

    return df.select(id_col, bin_col).mapInPandas(extract,
                                                  VIDEO_META_SCHEMA)


def scene_cuts(df: DataFrame, id_col: str, bin_col: str,
               frame_bytes: int = 32, threshold: int = 150) -> DataFrame:
    """Scene-change detection over fixed-stride frames — the classic
    luminance-delta cut detector, reduced to its integer-exact core:
    per frame an exact byte-sum "luminance", a cut wherever the
    absolute delta to the previous frame exceeds ``threshold``.
    Returns a per-video summary: (id, n_frames, n_cuts, max_delta).

    Composition shape (the multimodal pipeline pattern): frame slicing
    is ``frame_sample`` — JVM sequence+explode+substring, whole-stage
    codegen, no Python; the per-frame byte reduce is one Arrow
    ``mapInPandas`` (constant work per frame byte); the temporal delta
    is a lag() window partitioned by video (groups = frames of ONE
    video, never the corpus). Linear at any scale; a real container
    format swaps frame_sample for a parsing Arrow stage, everything
    downstream unchanged.
    """
    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        frame_sample,
    )

    frames = frame_sample(df, id_col, bin_col, frame_bytes=frame_bytes)
    id_t = dict(df.dtypes)[id_col]

    def lum(batches):
        for pdf in batches:
            sums = [int(np.frombuffer(bytes(b), dtype=np.uint8)
                        .astype(np.int64).sum())
                    for b in pdf["frame"]]
            yield pd.DataFrame({"id": pdf[id_col],
                                "frame_idx": pdf["frame_idx"],
                                "lum": sums})

    stats = frames.select(id_col, "frame_idx", "frame").mapInPandas(
        lum, f"id {id_t}, frame_idx int, lum bigint")
    w = Window.partitionBy("id").orderBy("frame_idx")
    deltas = (stats
              .withColumn("__prev", F.lag("lum").over(w))
              .withColumn("__delta", F.abs(F.col("lum") - F.col("__prev"))))
    return (deltas.groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.sum(F.when(F.col("__delta") > threshold, 1)
                       .otherwise(0)).cast("long").alias("n_cuts"),
                 F.coalesce(F.max("__delta"), F.lit(0)).cast("long")
                 .alias("max_delta")))
