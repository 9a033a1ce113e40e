"""Vendored audio plumbing: RIFF/WAVE PCM codec + Arrow-batched feature
extraction.

Audio follows the same multimodal design as images
(``operators/multimodal.py``): payloads travel as opaque ``binary``
columns, Spark never interprets the bytes outside explicitly-batched
``mapInPandas`` stages, and the vendored tier covers what the container
can exercise for REAL — canonical RIFF/WAVE with 16-bit integer PCM
(the public Microsoft/IBM format, also the shape ``wave`` in the stdlib
emits). Compressed codecs (MP3/AAC/FLAC...) have no in-container
decoder; like JPEG-progressive for images they fall through as
not-ours rather than half-decoding.

PCM is LOSSLESS, which makes the audio tier stronger than the image
tier for verification: decode(encode(samples)) == samples always, and
every feature below is integer arithmetic over the exact samples — so
the oracle query (q157) checks sums-of-squares, zero crossings, and
peaks as exact BIGINTs, no float tolerance anywhere.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def encode_wav_pcm16(samples: bytes | np.ndarray, sample_rate: int,
                     channels: int = 1) -> bytes:
    """Interleaved int16 samples → canonical 44-byte-header WAV."""
    if isinstance(samples, np.ndarray):
        data = samples.astype("<i2").tobytes()
    else:
        data = bytes(samples)
    if len(data) % (2 * channels):
        raise ValueError("encode_wav_pcm16: partial frame")
    byte_rate = sample_rate * channels * 2
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    sample_rate, byte_rate,
                                    channels * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav_pcm16(raw: bytes):
    """RIFF/WAVE decode → (sample_rate, channels, n_frames, samples) with
    ``samples`` an int16 numpy array of interleaved frames. ``None`` when
    the payload is not RIFF/WAVE or uses a non-PCM16 encoding (compressed
    / float / 24-bit: not vendored — falls through); ``ValueError`` for a
    recognized-but-corrupt payload. A real decode: the data chunk is
    length-validated and materialized, not sniffed."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    if len(raw) < 12:
        raise ValueError("wav: truncated header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        ctype = raw[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("wav: truncated chunk")
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        pos += 8 + clen + (clen & 1)       # chunks are word-aligned
    if fmt is None or len(fmt) < 16:
        raise ValueError("wav: missing fmt chunk")
    audio_format, channels, sample_rate, _, block_align, bits = \
        struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1 or bits != 16:
        return None                        # non-PCM16: not vendored
    if channels < 1 or sample_rate <= 0:
        raise ValueError("wav: bad fmt fields")
    if data is None:
        raise ValueError("wav: missing data chunk")
    if block_align != channels * 2:
        raise ValueError("wav: block align mismatch")
    if len(data) % block_align:
        raise ValueError("wav: partial frame in data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return sample_rate, channels, len(samples) // channels, samples


AUDIO_FEATURE_SCHEMA = ("id bigint, sample_rate int, channels int, "
                        "n_frames bigint, duration_ms bigint, "
                        "sum_sq bigint, peak int, zero_crossings bigint, "
                        "error string")


def audio_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """WAV decode + integer-exact features, Arrow-batched via
    ``mapInPandas`` (the ``decode_image`` pattern for the audio
    modality): per payload — sample rate / channels / frame count /
    floor-ms duration, and over the FIRST channel: exact sum of squared
    samples (energy; BIGINT — max |s|^2·n fits comfortably), peak
    absolute sample, and the signed zero-crossing count
    (sign(s_i) != sign(s_{i-1}), zeros keeping the previous sign — the
    convention a SQL lag() reproduces). Non-WAV / compressed payloads
    degrade to the engine's P12 error-row convention
    (``error='DecoderMissing'``); corrupt WAVs are
    ``error='DecodeError:...'`` rows, never exceptions mid-pipeline."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(raw)
                try:
                    decoded = decode_wav_pcm16(raw)
                except ValueError as exc:
                    rows.append((i, None, None, None, None, None, None,
                                 None, f"DecodeError:{exc}"))
                    continue
                if decoded is None:
                    rows.append((i, None, None, None, None, None, None,
                                 None, "DecoderMissing"))
                    continue
                rate, nch, n_frames, samples = decoded
                ch0 = samples[::nch].astype(np.int64)
                if len(ch0):
                    sum_sq = int((ch0 * ch0).sum())
                    peak = int(np.abs(ch0).max())
                    # sign with zeros inheriting the previous sign:
                    # replace zeros by forward-fill of the sign series
                    sign = np.sign(ch0)
                    nz = sign != 0
                    idx = np.where(nz, np.arange(len(sign)), -1)
                    np.maximum.accumulate(idx, out=idx)
                    filled = np.where(idx >= 0, sign[idx], 0)
                    zc = int((filled[1:] != filled[:-1])
                             [filled[:-1] != 0].sum())
                else:
                    sum_sq, peak, zc = 0, 0, 0
                rows.append((i, rate, nch, n_frames,
                             n_frames * 1000 // rate, sum_sq, peak, zc,
                             None))
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "channels",
                               "n_frames", "duration_ms", "sum_sq",
                               "peak", "zero_crossings", "error"])

    return df.select(id_col, bin_col).mapInPandas(extract,
                                                  AUDIO_FEATURE_SCHEMA)


def audio_fingerprint_table(df: DataFrame, id_col: str,
                            bin_col: str, frames: int = 64) -> DataFrame:
    """(id, sig) 63-bit energy-delta audio fingerprints — the
    Haitsma-Kalker robust-hash idea reduced to its integer-exact core:
    split the first channel into ``frames`` equal-length frames
    (truncating the remainder), compute each frame's energy (exact
    sum of squared samples, BIGINT), and emit bit f = E[f+1] > E[f]
    for f = 0..frames-2. Re-encoded or lightly-noised audio keeps its
    energy CONTOUR, so near-dups land within a few bits; pair with
    dedup.hamming_pairs (bits=64) exactly like the image fingerprints.

    Division-free (equal frame lengths → energy comparisons equal mean
    comparisons), so replicable in ANSI SQL. Payloads that fail WAV
    decode or carry < ``frames`` samples get the 0 sentinel. Arrow-
    batched mapInPandas; one reshape+square pass per payload.
    """
    if not 2 <= frames <= 64:
        raise ValueError("audio_fingerprint_table: frames must be 2..64")
    powers = np.int64(1) << np.arange(frames - 1, dtype=np.int64)

    def sig(batches):
        for pdf in batches:
            out = []
            for raw in pdf[bin_col]:
                raw = bytes(raw) if raw is not None else b""
                try:
                    decoded = decode_wav_pcm16(raw)
                except ValueError:
                    decoded = None
                if decoded is None:
                    out.append(0)
                    continue
                _, nch, _, samples = decoded
                ch0 = samples[::nch].astype(np.int64)
                flen = len(ch0) // frames
                if flen == 0:
                    out.append(0)
                    continue
                e = (ch0[:flen * frames] ** 2).reshape(frames, flen) \
                    .sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.int64)
                out.append(int((bits * powers).sum()))
            yield pd.DataFrame({"id": pdf[id_col], "sig": out})

    return df.select(id_col, bin_col).mapInPandas(
        sig, f"id {dict(df.dtypes)[id_col]}, sig bigint")
