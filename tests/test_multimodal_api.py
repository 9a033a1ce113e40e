"""Multimodal binary-column plumbing + simulated REST API source."""

import hashlib
import time

import pytest
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.operators.multimodal import (
    binary_metadata, byte_features, decode_image, frame_sample,
)
from league_of_legends_data_pipeline_spark.sources.api import (
    CircuitBreaker, SlidingWindowRateLimiter, http_source, simulated_fetch,
)


def test_byte_features_oracle(spark):
    texts = [(1, "hello world"), (2, ""), (3, "AaZz09")]
    df = spark.createDataFrame(texts, ["id", "t"]) \
        .select("id", F.encode("t", "UTF-8").alias("bin"))
    got = {r["id"]: r.asDict() for r in byte_features(df, "id", "bin").collect()}
    for i, t in texts:
        raw = t.encode()
        assert got[i]["n_bytes"] == len(raw)
        assert got[i]["checksum"] == hashlib.md5(raw).hexdigest()
        if raw:
            assert got[i]["mean_byte"] == pytest.approx(sum(raw) / len(raw), abs=1e-6)
            assert got[i]["max_byte"] == max(raw)
        else:
            assert got[i]["mean_byte"] == 0.0 and got[i]["max_byte"] == 0


def test_binary_metadata_jvm_side(spark):
    df = spark.createDataFrame([(1, "abc")], ["id", "t"]) \
        .select("id", F.encode("t", "UTF-8").alias("bin"))
    r = df.select(*binary_metadata("bin")).collect()[0]
    assert r["n_bytes"] == 3
    assert r["digest"] == hashlib.md5(b"abc").hexdigest()


def test_decode_missing_decoder_modes(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], ["id", "bin"])
    try:
        import PIL.Image  # noqa: F401
        pytest.skip("imaging library present; stub paths not reachable")
    except ImportError:
        pass
    # default: graceful P12 error rows, no surprise exception
    rows = decode_image(df, "id", "bin").collect()
    assert [(r["id"], r["width"], r["error"]) for r in rows] == \
        [(1, None, "DecoderMissing")]
    # opt-in fail-fast
    with pytest.raises(NotImplementedError):
        decode_image(df, "id", "bin", missing_decoder="raise")


def _ppm(w, h, *, comment=False, truncate=0, gray=False):
    magic = b"P5" if gray else b"P6"
    hdr = magic + (b"\n# a comment\n" if comment else b"\n")
    hdr += f"{w} {h}\n255\n".encode()
    body = bytes((x * 7) % 256
                 for x in range(w * h * (1 if gray else 3) - truncate))
    return hdr + body


def _bmp(w, h, bpp=24, truncate=0, compression=0):
    import struct
    row = (w * bpp + 31) // 32 * 4
    body = bytes(row * h - truncate)
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, bpp, compression,
                         len(body), 2835, 2835, 0, 0))
    return hdr + body


def _bmp_os2(w, h, bpp=24):
    # OS/2 BITMAPCOREHEADER: DIB size 12, u16 width/height — the
    # BITMAPINFOHEADER field offsets decode garbage from this layout
    import struct
    row = (w * bpp + 31) // 32 * 4
    body = bytes(row * h)
    hdr = (b"BM" + struct.pack("<IHHI", 26 + len(body), 0, 0, 26)
           + struct.pack("<IHHHH", 12, w, h, 1, bpp))
    return hdr + body


def test_decode_image_vendored_formats_end_to_end(spark):
    """Real bytes through the real mapInPandas decode path — no library,
    no stub: PPM/PGM/BMP dimensions come from parsing the payload, and
    corrupt payloads surface as DecodeError rows, not exceptions."""
    payloads = [
        (1, _ppm(5, 4)),                       # P6 RGB
        (2, _ppm(3, 2, comment=True)),         # header comment skipped
        (3, _ppm(7, 2, gray=True)),            # P5 grayscale
        (4, _bmp(6, 3)),                       # BMP 24bpp, top-down height
        (5, _bmp(2, 2, bpp=32)),               # BMP RGBA
        (6, _ppm(5, 4, truncate=1)),           # short raster -> error
        (7, _bmp(6, 3, truncate=5)),           # short raster -> error
        (8, b"GIF89a not ours"),               # unknown magic
        (9, _bmp_os2(6, 3)),                   # OS/2 core header -> not ours
        (10, _bmp(6, 3, compression=1)),       # BI_RLE8 -> not ours
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads], ["id", "bin"])
    got = {r["id"]: (r["width"], r["height"], r["mode"], r["error"])
           for r in decode_image(df, "id", "bin").collect()}
    assert got[1] == (5, 4, "RGB", None)
    assert got[2] == (3, 2, "RGB", None)
    assert got[3] == (7, 2, "L", None)
    assert got[4] == (6, 3, "RGB", None)
    assert got[5] == (2, 2, "RGBA", None)
    assert got[6][3] == "DecodeError:netpbm: truncated raster"
    assert got[7][3] == "DecodeError:bmp: truncated raster"
    assert got[8][:3] == (None, None, None) and got[8][3] in (
        "DecoderMissing",) or got[8][3].startswith("DecodeError")
    # OS/2 / compressed BMPs must NOT be mis-decoded with the
    # BITMAPINFOHEADER offsets — they fall through (DecoderMissing here,
    # Pillow when present), never a silently-wrong width/height
    for i in (9, 10):
        assert got[i][:2] == (None, None) or got[i][:2] == (6, 3)
        assert got[i][:2] != (0, 0)


def test_bmp_dib_sniff_before_length_floor():
    """A SMALL but complete OS/2 BMP (26-byte core header; 1x1 is ~30
    bytes total, under the 54-byte BITMAPINFOHEADER minimum) must fall
    through as not-ours (None), not error as 'truncated' — the DIB-size
    sniff needs only 18 bytes and must run before the 54-byte floor.
    Round-7 ADVICE: the floor ran first and mislabeled these."""
    import struct

    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        _decode_image_native,
    )
    tiny_os2 = _bmp_os2(1, 1)
    assert len(tiny_os2) < 54          # the case the old order mishandled
    assert _decode_image_native(tiny_os2) is None
    # genuinely truncated payloads still error, at both tiers:
    with pytest.raises(ValueError):    # can't even read the DIB size
        _decode_image_native(b"BM" + bytes(10))
    info_truncated = (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
                      + struct.pack("<I", 40))   # dib=40 claimed, 22 bytes
    with pytest.raises(ValueError):
        _decode_image_native(info_truncated)


def test_encode_decode_pixel_roundtrip():
    """encode_ppm/encode_bmp24 are exact inverses of the vendored
    decoders at the PIXEL level: decode(encode(px)) == px for every
    normalization the BMP path must undo (bottom-up rows, BGR order,
    4-byte padding — odd widths exercise nonzero padding)."""
    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        _decode_image_native, encode_bmp24, encode_ppm,
    )
    px = bytes((7 * i + 3) % 256 for i in range(6 * 3 * 3))
    cases = [
        (encode_ppm(px, 6, 3), (6, 3, "RGB"), 54),
        (encode_ppm(px, 4, 3, gray=True), (4, 3, "L"), 12),
        (encode_bmp24(px, 6, 3), (6, 3, "RGB"), 54),   # padding-free rows
        (encode_bmp24(px, 5, 2), (5, 2, "RGB"), 30),   # 15->16 row pad
        (encode_bmp24(px, 3, 1), (3, 1, "RGB"), 9),    # 9->12 row pad
    ]
    for payload, want_whm, n in cases:
        got = _decode_image_native(payload, want_pixels=True)
        assert got[:3] == want_whm
        assert got[3] == px[:n]
        # 3-tuple contract unchanged without want_pixels
        assert _decode_image_native(payload) == want_whm
    with pytest.raises(ValueError):
        encode_bmp24(px[:10], 6, 3)
    with pytest.raises(ValueError):
        encode_ppm(px[:10], 6, 3)


def test_png_decode_all_filters_and_fallthrough():
    """Vendored PNG tier: encode/decode roundtrip for L/RGB/RGBA, every
    scanline filter (Sub/Up/Average/Paeth) decoded against hand-filtered
    reference rows, palette PNG falls through (None), corrupt IDAT is a
    loud DecodeError — a real decode via stdlib zlib, not sniffing."""
    import struct
    import zlib

    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        _decode_image_native, encode_png,
    )

    px = bytes((11 * i + 5) % 256 for i in range(8 * 4 * 4))
    for mode, ch in [("L", 1), ("RGB", 3), ("RGBA", 4)]:
        got = _decode_image_native(encode_png(px, 8, 4, mode),
                                   want_pixels=True)
        assert got == (8, 4, mode, px[:8 * 4 * ch])
        assert _decode_image_native(encode_png(px, 8, 4, mode)) == \
            (8, 4, mode)

    # one row per filter type, filtered by hand (the encode direction
    # our filter-0-only encoder never produces)
    w, h, ch = 5, 5, 3
    stride = w * ch
    raw_px = bytes((7 * i + 13) % 256 for i in range(stride * h))
    rows = [raw_px[y * stride:(y + 1) * stride] for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    scan, prev = bytearray(), bytes(stride)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        row, out = rows[y], bytearray(rows[y])
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 1:
                out[x] = (row[x] - a) & 0xFF
            elif f == 2:
                out[x] = (row[x] - b) & 0xFF
            elif f == 3:
                out[x] = (row[x] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                out[x] = (row[x] - paeth(a, b, c)) & 0xFF
        scan += bytes([f]) + bytes(out)
        prev = row

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (sig + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(scan)))
               + chunk(b"IEND", b""))
    assert _decode_image_native(payload, want_pixels=True) == \
        (w, h, "RGB", raw_px)

    pal_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = (sig + chunk(b"IHDR", pal_ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + chunk(b"IEND", b""))
    assert _decode_image_native(pal) is None
    bad = (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"\x01\x02")
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        _decode_image_native(bad)


def test_jpeg_baseline_codec():
    """Vendored T.81 baseline subset: flat greyscale round-trips
    EXACTLY (the q156 oracle window — even values, DC step 16), smooth
    content round-trips within quant-step error bounds, non-baseline
    streams fall through (None), corrupt streams error loudly."""
    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )
    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        _decode_image_native,
    )

    # exact window, incl. dims crossing the 8px block boundary
    for v, w, h in [(100, 8, 8), (42, 13, 5), (126, 9, 10), (2, 3, 2)]:
        raw = encode_jpeg_baseline(bytes([v]) * (w * h), w, h, "L")
        assert decode_jpeg_baseline(raw) == (w, h, "L",
                                             bytes([v]) * (w * h))
        # and through the decode_image tier dispatcher
        assert _decode_image_native(raw) == (w, h, "L")
        assert _decode_image_native(raw, want_pixels=True)[3] == \
            bytes([v]) * (w * h)

    # lossy-but-bounded on a gradient (error < quant step)
    w, h = 24, 16
    grad = bytes((x * 255) // (w - 1) for _ in range(h) for x in range(w))
    _, _, _, px = decode_jpeg_baseline(
        encode_jpeg_baseline(grad, w, h, "L"))
    err = np.abs(np.frombuffer(px, np.uint8).astype(int)
                 - np.frombuffer(grad, np.uint8).astype(int))
    assert err.max() <= 24

    # RGB path: YCbCr round-trip on blocky content stays close
    rng = np.random.default_rng(7)
    blocky = rng.integers(60, 200, (4, 4, 3)).repeat(4, 0).repeat(4, 1) \
        .astype(np.uint8)
    gw, gh, gm, px = decode_jpeg_baseline(
        encode_jpeg_baseline(blocky.tobytes(), 16, 16, "RGB"))
    assert (gw, gh, gm) == (16, 16, "RGB")
    err = np.abs(np.frombuffer(px, np.uint8).astype(int)
                 - blocky.reshape(-1).astype(int))
    assert err.max() <= 64 and err.mean() < 12

    # progressive (SOF2) falls through as not-ours, never half-decodes
    raw = bytearray(encode_jpeg_baseline(bytes(64), 8, 8, "L"))
    sof0 = raw.find(b"\xFF\xC0")
    raw[sof0 + 1] = 0xC2
    assert decode_jpeg_baseline(bytes(raw)) is None
    # truncated scan errors loudly
    good = encode_jpeg_baseline(bytes(range(0, 128, 2)), 8, 8, "L")
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[:len(good) - 6])


def test_frame_sample_slices_and_strides(spark):
    # 70 bytes, 32-byte frames -> frames at offsets 0 and 32 (tail dropped);
    # every_nth=2 on a 5-frame payload keeps frames 0, 2, 4
    payload = bytes(range(70))
    df = spark.createDataFrame([(1, bytearray(payload)),
                                (2, bytearray(b"short"))], ["id", "bin"])
    rows = frame_sample(df, "id", "bin", frame_bytes=32).collect()
    got = {(r["id"], r["frame_idx"]): bytes(r["frame"]) for r in rows}
    assert set(got) == {(1, 0), (1, 1)}          # id=2 has no full frame
    assert got[(1, 0)] == payload[0:32]
    assert got[(1, 1)] == payload[32:64]
    assert all(r["frame_off"] == r["frame_idx"] * 32 for r in rows)

    five = spark.createDataFrame([(3, bytearray(bytes(5 * 8)))], ["id", "bin"])
    kept = sorted(r["frame_idx"] for r in
                  frame_sample(five, "id", "bin", frame_bytes=8,
                               every_nth=2).collect())
    assert kept == [0, 2, 4]


def test_http_source_statuses_and_retry(spark):
    # craft keys covering all three outcome classes
    perm, transient, ok = [], [], []
    i = 0
    while not (perm and transient and ok):
        d = hashlib.md5(str(i).encode()).hexdigest()
        if d.startswith("ff"):
            perm.append(str(i))
        elif d.startswith("f"):
            transient.append(str(i))
        else:
            ok.append(str(i))
        i += 1
    keys = [perm[0], transient[0], ok[0]]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = {r["request_key"]: r.asDict()
           for r in http_source(df, "key").collect()}
    assert got[perm[0]]["status"] == 429
    assert got[perm[0]]["error"] == "Error429" and got[perm[0]]["payload"] is None
    # transient 429 succeeds on retry (attempt>=1)
    assert got[transient[0]]["status"] == 200 and got[transient[0]]["error"] is None
    assert got[ok[0]]["status"] == 200
    lvl = int(hashlib.md5(ok[0].encode()).hexdigest()[:2], 16)
    assert f'"championLevel": {lvl}' in got[ok[0]]["payload"]


def test_rate_limiter_blocks():
    rl = SlidingWindowRateLimiter(max_requests=3, window_seconds=0.3)
    t0 = time.monotonic()
    for _ in range(5):
        rl.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.25  # 4th/5th acquires had to wait for the window


def test_simulated_fetch_deterministic():
    assert simulated_fetch("abc", 0) == simulated_fetch("abc", 0)
    status, payload = simulated_fetch("abc", 0)
    assert status in (200, 429)


def test_circuit_breaker_trips_and_recovers():
    # fake clock so OPEN -> HALF_OPEN transition is deterministic
    now = [0.0]
    cb = CircuitBreaker(failure_threshold=3, recovery_timeout=10.0,
                        clock=lambda: now[0])
    assert cb.state == "CLOSED" and cb.can_execute()
    for _ in range(3):
        assert cb.can_execute()
        cb.on_failure()
    assert cb.state == "OPEN" and not cb.can_execute()
    now[0] = 5.0
    assert not cb.can_execute()  # still within recovery_timeout
    now[0] = 10.5
    assert cb.can_execute() and cb.state == "HALF_OPEN"  # probe allowed
    cb.on_failure()  # probe fails -> re-open
    assert cb.state == "OPEN" and not cb.can_execute()
    now[0] = 21.5
    assert cb.can_execute()
    cb.on_success()  # probe succeeds -> close
    assert cb.state == "CLOSED" and cb.failure_count == 0


def test_http_source_circuit_breaker_short_circuits(spark):
    # an always-failing endpoint: breaker opens after 2 failures, so later
    # keys in the same partition short-circuit to a CircuitOpen sentinel
    # without touching the endpoint
    calls_per_key: dict[str, int] = {}

    def always_503(key, attempt):
        calls_per_key[key] = calls_per_key.get(key, 0) + 1
        return 503, None

    df = spark.createDataFrame([(f"k{i}",) for i in range(6)],
                               ["key"]).coalesce(1)
    rows = {r["request_key"]: r.asDict()
            for r in http_source(
                df, "key", fetch_fn=always_503, max_retries=0,
                breaker_factory=lambda: CircuitBreaker(
                    failure_threshold=2, recovery_timeout=3600.0)).collect()}
    assert len(rows) == 6  # every key still yields a row (P12: no drops)
    tripped = [k for k, r in rows.items() if r["error"] == "CircuitOpen"]
    real = [k for k, r in rows.items() if r["error"] == "Error503"]
    assert len(real) == 2 and len(tripped) == 4
    # short-circuited keys never reached the endpoint
    assert all(k not in calls_per_key for k in tripped)


def test_http_source_breaker_keeps_success_path_identical(spark):
    # with a healthy endpoint the breaker never trips and results match
    # the breaker-less run exactly (q39 stability)
    df = spark.createDataFrame([(str(i),) for i in range(20)], ["key"])
    base = sorted(tuple(r) for r in http_source(df, "key").collect())
    with_cb = sorted(tuple(r) for r in http_source(
        df, "key", breaker_factory=CircuitBreaker).collect())
    assert base == with_cb


# --- perceptual hashing ----------------------------------------------------

def test_ahash_identical_and_corrupted_payloads(spark):
    """Identical payloads hash identically; a single flipped byte moves
    the hash by a small hamming distance; empty payloads hash to 0."""
    from pyspark.sql import functions as F

    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        ahash_signature_table,
    )

    base = bytes(range(256)) * 4
    corrupted = bytearray(base)
    corrupted[100] = 255
    rows = [(1, base), (2, base), (3, bytes(corrupted)), (4, b"")]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    got = {r["media_id"]: r["sig"]
           for r in ahash_signature_table(df, "media_id", "payload").collect()}
    assert got[1] == got[2]
    assert got[4] == 0
    # a one-byte flip moves the hash by AT MOST a few bits (possibly zero
    # — robustness to small corruption is the operator's point)
    assert bin(got[1] ^ got[3]).count("1") <= 5
    assert all(0 <= s < (1 << 60) for s in got.values())


def test_media_neardup_pairs_lossless_banding(spark):
    """The banded join must find exactly the pairs an exact all-pairs
    hamming scan finds at the same threshold."""
    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        ahash_signature_table, media_neardup_pairs,
    )

    import itertools

    payloads = []
    for i in range(12):
        b = bytearray((17 * j + 31 * i) % 251 for j in range(600))
        payloads.append((i, bytes(b)))
    # near-dups of 0..3: one byte flipped
    for i in range(4):
        b = bytearray(payloads[i][1])
        b[50] = (b[50] + 128) % 256
        payloads.append((100 + i, bytes(b)))
    df = spark.createDataFrame(payloads, ["media_id", "payload"])
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in media_neardup_pairs(df, "media_id", "payload").collect()}
    sigs = {r["media_id"]: r["sig"]
            for r in ahash_signature_table(df, "media_id", "payload").collect()}
    expect = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin(sigs[a] ^ sigs[b]).count("1")
        if h <= 5:
            expect[(a, b)] = h
    assert got == expect
    assert all((i, 100 + i) in got for i in range(4))


def test_ahash_null_payload_is_sentinel(spark):
    """A NULL payload must hash to the empty sentinel (0), not crash the
    Arrow batch."""
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        ahash_signature_table,
    )

    schema = StructType([StructField("media_id", LongType()),
                         StructField("payload", BinaryType())])
    df = spark.createDataFrame([(1, None), (2, b"abc")], schema)
    got = {r["media_id"]: r["sig"]
           for r in ahash_signature_table(df, "media_id", "payload").collect()}
    assert got[1] == 0 and got[2] != 0


def test_resize_payloads_python_oracle(spark):
    """Down/up-sampled bytes must match a per-definition python oracle;
    empty and NULL payloads resize to all-zero bytes."""
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        resize_payloads,
    )

    T = 8

    def py_resize(raw: bytes) -> str:
        n = len(raw)
        if n == 0:
            return "00" * T
        if n >= T:
            out = []
            for k in range(T):
                lo, hi = k * n // T, (k + 1) * n // T
                s, ln = sum(raw[lo:hi]), hi - lo
                out.append((s * 2 + ln) // (2 * ln))
        else:
            out = [raw[k * n // T] for k in range(T)]
        return bytes(out).hex()

    payloads = [bytes(range(100)), b"abc", b"", bytes([255] * 9)]
    schema = StructType([StructField("media_id", LongType()),
                         StructField("payload", BinaryType())])
    rows = [(i, p) for i, p in enumerate(payloads)] + [(99, None)]
    df = spark.createDataFrame(rows, schema)
    got = {r["media_id"]: (r["n_in"], r["resized"])
           for r in resize_payloads(df, "media_id", "payload",
                                    target_len=T).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == (len(p), py_resize(p)), i
    assert got[99] == (0, "00" * T)


def test_wav_pcm16_roundtrip_and_conventions(spark):
    """Vendored audio tier: lossless PCM roundtrip (mono + stereo),
    forward-fill zero-crossing convention on signals WITH zeros,
    non-PCM fallthrough, corrupt-payload error rows."""
    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.audio import (
        audio_features, decode_wav_pcm16, encode_wav_pcm16,
    )

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, 100).astype("<i2")
    rate, nch, nfr, got = decode_wav_pcm16(encode_wav_pcm16(mono, 16000))
    assert (rate, nch, nfr) == (16000, 1, 100)
    assert np.array_equal(got, mono)
    stereo = rng.integers(-32768, 32768, 120).astype("<i2")
    rate, nch, nfr, got = decode_wav_pcm16(
        encode_wav_pcm16(stereo, 44100, channels=2))
    assert (rate, nch, nfr) == (44100, 2, 60)
    assert np.array_equal(got, stereo)

    # features via the Spark stage: zeros inherit the previous sign
    # (forward fill), so [3, 0, 0, -5, 0, 2] has crossings at -5 and 2
    sig = np.array([3, 0, 0, -5, 0, 2], dtype="<i2")
    wav = encode_wav_pcm16(sig, 8000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)),
         (2, bytearray(b"ID3\x04mp3-ish payload")),   # not RIFF
         (3, bytearray(b"RIFF\x10\x00\x00\x00WAVEfmt "))],  # truncated
        ["id", "bin"])
    rows = {r["id"]: r for r in audio_features(df, "id", "bin").collect()}
    assert rows[1]["zero_crossings"] == 2
    assert rows[1]["sum_sq"] == 9 + 25 + 4
    assert rows[1]["peak"] == 5
    assert rows[1]["n_frames"] == 6
    assert rows[1]["error"] is None
    assert rows[2]["error"] == "DecoderMissing"
    assert rows[3]["error"].startswith("DecodeError:")

    # float-WAV (format 3) falls through rather than mis-decoding
    import struct
    f32 = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000,
                                   32000, 4, 32)
           + b"data" + struct.pack("<I", 0))
    assert decode_wav_pcm16(f32) is None


def test_mp4_metadata_walk(spark):
    """Vendored video tier: box-tree roundtrip (v0 headers, 16.16 dims,
    non-1000 timescales), v1 64-bit header parse, non-BMFF fallthrough,
    corrupt-tree error rows — all through the Spark stage."""
    import struct

    from league_of_legends_data_pipeline_spark.operators.video import (
        encode_mp4_stub, parse_mp4_metadata, video_metadata,
    )

    good = encode_mp4_stub(1280, 720, 90125, timescale=90000,
                           major_brand=b"mp42")
    df = spark.createDataFrame(
        [(1, bytearray(good)),
         (2, bytearray(b"\x1aE\xdf\xa3 webm-ish")),       # not BMFF
         (3, bytearray(good[:40]))],                      # corrupt tree
        ["id", "bin"])
    rows = {r["id"]: r for r in video_metadata(df, "id", "bin").collect()}
    r1 = rows[1]
    assert (r1["major_brand"], r1["timescale"], r1["n_tracks"],
            r1["width"], r1["height"]) == ("mp42", 90000, 1, 1280, 720)
    # ms -> ticks -> ms floor-div roundtrip
    assert r1["duration_ms"] == (90125 * 90000 // 1000) * 1000 // 90000
    assert rows[2]["error"] == "DecoderMissing"
    assert rows[3]["error"].startswith("DecodeError:")

    # version-1 mvhd (64-bit times) parses via the v1 layout
    raw = bytearray(encode_mp4_stub(320, 240, 2000, timescale=1000))
    mvhd_at = raw.find(b"mvhd")
    v0_payload = bytes(raw[mvhd_at + 4:mvhd_at + 4 + 100])
    ts, dur = struct.unpack_from(">II", v0_payload, 12)
    v1_payload = (b"\x01\x00\x00\x00"
                  + struct.pack(">QQIQ", 0, 0, ts, dur)
                  + v0_payload[20:])
    v1_box = struct.pack(">I", 8 + len(v1_payload)) + b"mvhd" + v1_payload
    # splice: rebuild moov with the v1 mvhd (sizes change)
    old_box = struct.pack(">I", 108) + b"mvhd" + v0_payload
    assert bytes(raw).count(old_box) == 1
    new = bytes(raw).replace(old_box, v1_box)
    # fix moov size (+12 bytes of v1 growth)
    moov_at = new.find(b"moov") - 4
    (moov_sz,) = struct.unpack_from(">I", new, moov_at)
    new = (new[:moov_at] + struct.pack(">I", moov_sz + 12)
           + new[moov_at + 4:])
    m = parse_mp4_metadata(new)
    assert m["timescale"] == 1000 and m["duration_ms"] == 2000


def test_jpeg_chroma_subsampling():
    """4:2:0 and 4:2:2 layouts (the dominant real-world shapes) decode
    through the generalized interleaved-MCU path: dims exact for
    non-multiple-of-16 sizes, flat color near-exact, smooth content
    bounded — and a 4:4:4 stream still round-trips the exact window."""
    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )

    rng = np.random.default_rng(3)
    for sub in ("420", "422"):
        for w, h in [(16, 16), (20, 12), (17, 9)]:
            blocky = rng.integers(60, 200,
                                  ((h + 3) // 4, (w + 3) // 4, 3)) \
                .repeat(4, 0).repeat(4, 1)[:h, :w].astype(np.uint8)
            got = decode_jpeg_baseline(encode_jpeg_baseline(
                blocky.tobytes(), w, h, "RGB", subsampling=sub))
            assert got is not None and got[:3] == (w, h, "RGB")
            err = np.abs(np.frombuffer(got[3], np.uint8).astype(int)
                         - blocky.reshape(-1).astype(int))
            assert err.mean() < 16, (sub, w, h, err.mean())
    flat = bytes([120, 64, 200]) * (16 * 16)
    got = decode_jpeg_baseline(encode_jpeg_baseline(
        flat, 16, 16, "RGB", subsampling="420"))
    err = np.abs(np.frombuffer(got[3], np.uint8).astype(int)
                 - np.frombuffer(flat, np.uint8).astype(int))
    assert err.max() <= 2
    # the q156 exactness window is untouched by the generalization
    assert decode_jpeg_baseline(encode_jpeg_baseline(
        bytes([42]) * (13 * 5), 13, 5, "L")) == \
        (13, 5, "L", bytes([42]) * (13 * 5))


def test_jpeg_restart_marker_stream():
    """DRI/RSTn handling: the entropy stream is 1-padded to a byte
    boundary before each restart marker, so the decoder must DISCARD
    pad bits before expecting the marker (reading them as data swallows
    the boundary — the round-8 fix). Stream built from the codec's own
    primitives: two flat MCUs, independent DC predictors, RST0 between."""
    import struct

    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.jpeg import (
        _AC_BITS, _AC_VALS, _BitWriter, _DC_BITS, _DC_VALS, _QT_LUMA,
        _dht, _dqt, _encode_block, _seg, decode_jpeg_baseline,
    )

    chunks = []
    for v in (100, 60):
        bw = _BitWriter()
        _encode_block(bw, np.full((8, 8), v), _QT_LUMA, 0)
        chunks.append(bw.flush())
    out = bytearray(b"\xFF\xD8")
    out += _dqt(0, _QT_LUMA)
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1)
                + bytes([1, 0x11, 0]))
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_BITS, _AC_VALS)
    out += _seg(0xDD, struct.pack(">H", 1))          # DRI: interval 1
    out += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3F\x00")
    out += chunks[0] + b"\xFF\xD0" + chunks[1] + b"\xFF\xD9"
    got = decode_jpeg_baseline(bytes(out))
    assert got is not None and got[:3] == (16, 8, "L")
    px = np.frombuffer(got[3], np.uint8).reshape(8, 16)
    assert (px[:, :8] == 100).all() and (px[:, 8:] == 60).all()
