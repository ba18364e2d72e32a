"""Multimodal plumbing tests: binary columns survive the Arrow
round-trip exactly, the mapInPandas batch contract holds, and the
decode stub fails loudly rather than faking silently."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from alternating_least_squares_spark.functions.multimodal import (
    attach_blob,
    blob_length,
    blob_md5,
    decode_image,
    extract_media_features,
)
from alternating_least_squares_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_features_match_jvm_side_byte_math(spark):
    """Python-side (mapInPandas) length/md5 equal the JVM-side exprs —
    proves bytes cross Arrow unmodified."""
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    with_blob = attach_blob(docs)
    feats = {
        r["doc_id"]: (r["n_bytes"], r["md5"])
        for r in extract_media_features(with_blob).collect()
    }
    jvm = {
        r["doc_id"]: (r["n"], r["h"])
        for r in with_blob.select(
            "doc_id",
            blob_length(F.col("blob")).cast("long").alias("n"),
            blob_md5(F.col("blob")).alias("h"),
        ).collect()
    }
    assert feats == jvm and len(feats) == 50


def test_feature_schema_and_determinism(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(10)
    out = extract_media_features(attach_blob(docs))
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:bigint,md5:string,"
        "fake_mean_byte:double,decoded_width:int,decoded_height:int>"
    )
    a = sorted(out.collect())
    b = sorted(extract_media_features(attach_blob(docs)).collect())
    assert a == b  # deterministic fake decode
    row = a[0]
    digest = row["md5"]
    assert row["decoded_width"] == int(digest[:4], 16) % 1920
    assert row["decoded_height"] == int(digest[4:8], 16) % 1080


def test_blob_bytes_are_utf8_of_text(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    for r in attach_blob(docs).join(docs, "doc_id").select("text", "blob").collect():
        assert bytes(r["blob"]) == r["text"].encode("utf-8")
        assert hashlib.md5(bytes(r["blob"])).hexdigest() == hashlib.md5(
            r["text"].encode()
        ).hexdigest()


def test_decode_image_dispatches_every_real_decoder():
    """The PIL gate is GONE (VERDICT r17 #3): decode_image routes by
    container signature to the stdlib decoders and refuses unknown
    signatures loudly."""
    from alternating_least_squares_spark.functions.multimodal import (
        encode_bmp,
        encode_jpeg,
        encode_png,
    )

    px_rgb = bytes(range(8 * 2 * 3))
    w, h, ch, px = decode_image(encode_png(px_rgb, 8, 2, 3, [0, 1]))
    assert (w, h, ch, px) == (8, 2, 3, px_rgb)
    w, h, ch, px = decode_image(encode_bmp(px_rgb, 8, 2))
    assert (w, h, ch) == (8, 2, 3) and px == px_rgb
    gray = bytes(range(64))
    w, h, ch, px = decode_image(encode_jpeg(gray, 8, 8, 1))
    assert (w, h, ch) == (8, 8, 1) and len(px) == 64
    with pytest.raises(ValueError, match="unrecognized image signature"):
        decode_image(b"GIF89a\x00\x00")


def test_sample_frames_boundaries_and_expansion(spark):
    from alternating_least_squares_spark.functions.multimodal import (
        sample_frames,
    )

    docs = spark.createDataFrame(
        [
            (1, "a" * 64),          # exactly one frame -> idx 0 only
            (2, "b" * 65),          # 2 frames, stride 4 -> idx 0 only
            (3, "c" * (64 * 5)),    # 5 frames -> idx 0 and 4
            (4, ""),                # empty -> no rows
            (5, None),              # NULL -> no rows
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): r
        for r in sample_frames(docs).collect()
    }
    assert set(rows) == {(1, 0), (2, 0), (3, 0), (3, 4)}
    assert rows[(2, 0)]["n_bytes"] == 64  # first chunk is full
    # the sampled 5th frame of doc 3 is the last 64 bytes
    assert rows[(3, 4)]["n_bytes"] == 64
    assert rows[(1, 0)]["frame_md5"] == hashlib.md5(b"a" * 64).hexdigest()


def test_media_features_null_blob_reads_as_empty(spark):
    """A NULL payload (NULL document text upstream) hashes as empty
    bytes instead of killing the task inside hashlib."""
    import hashlib

    from alternating_least_squares_spark.functions.multimodal import (
        extract_media_features,
    )

    d = spark.createDataFrame(
        [(1, None), (2, bytearray(b"xy"))], "doc_id long, blob binary"
    )
    got = {r["doc_id"]: (r["n_bytes"], r["md5"]) for r in extract_media_features(d).collect()}
    assert got[1] == (0, hashlib.md5(b"").hexdigest())
    assert got[2][0] == 2


def test_resize_stride_bytes_and_md5(spark):
    """mm04 plumbing: every stride-th byte, empty/NULL rows dropped."""
    from alternating_least_squares_spark.functions.multimodal import (
        resize_stride,
    )

    d = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, None), (4, "xyz")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["resized_bytes"], r["resized_md5"])
        for r in resize_stride(d, stride=4).collect()
    }
    assert set(got) == {1, 4}  # empty and NULL payloads leave the pipe
    assert got[1] == (10, 3, hashlib.md5(b"aei").hexdigest())
    assert got[4] == (3, 1, hashlib.md5(b"x").hexdigest())


def test_bmp_round_trip_all_padding_widths():
    """encode_bmp → decode_bmp is the identity on pixels for every
    row-padding case (w=2..5 → pad 2,3,0,1) and multiple heights."""
    from alternating_least_squares_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    for w in (2, 3, 4, 5):
        for h in (1, 2, 3):
            px = bytes(range(w * h * 3))
            blob = decode_bmp(encode_bmp(px, w, h))
            assert blob == (w, h, px)


def test_bmp_decode_is_a_real_parser():
    """The decoder reads the FORMAT, not our encoder's habits: a
    hand-built top-down BMP (negative height) with an oversized
    pixel-array offset decodes to the same pixels."""
    import struct

    from alternating_least_squares_spark.functions.multimodal import (
        decode_bmp,
    )

    w, h = 3, 2
    px = bytes(range(w * h * 3))
    row = w * 3
    pad = (-row) % 4
    # top-down: rows in natural order; 6 junk bytes before the array
    body = b"".join(
        px[r * row : (r + 1) * row] + b"\x00" * pad for r in range(h)
    )
    offset = 54 + 6
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    blob = head + info + b"junk42" + body
    assert decode_bmp(blob) == (w, h, px)


def test_bmp_decode_rejects_garbage():
    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(b"BM123")
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PN" + b"\x00" * 60)
    good = encode_bmp(b"\x01" * 12, 2, 2)
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        decode_bmp(good[:-4])
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_bmp(b"\x01" * 11, 2, 2)


def test_bmp_decode_rejects_nonpositive_dimensions():
    """ADVICE r9: a corrupt header with width ≤ 0 used to make the
    row size negative, the truncation check vacuously true, and the
    return a silent (negative_width, h, b'') — the decoder must
    raise instead. Height 0 is equally malformed (negative height
    is the legitimate top-down layout and stays accepted)."""
    import struct

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    good = encode_bmp(b"\x01" * 12, 2, 2)

    def with_dims(w: int, h: int) -> bytes:
        # rewrite the DIB width/height fields at offsets 18/22
        return (
            good[:18] + struct.pack("<ii", w, h) + good[26:]
        )

    for w, h in [(0, 2), (-2, 2), (2, 0), (0, 0), (-1, -1)]:
        with pytest.raises(ValueError, match="malformed BMP dimensions"):
            decode_bmp(with_dims(w, h))
    # sanity: the unmodified blob still decodes
    assert decode_bmp(good) == (2, 2, b"\x01" * 12)


def test_attach_bmp_blob_rejects_non_ascii_text(spark):
    """ADVICE r9: the BMP-planting contract (oracle restates pixels
    via char-based substring+rpad) only holds for ASCII text. A
    non-ASCII char inside the consumed prefix must fail loudly, not
    overflow the pixel buffer after UTF-8 expansion."""
    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        attach_bmp_blob,
    )

    d = spark.createDataFrame(
        [(7, "héllo bmp")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="requires ASCII text"):
        attach_bmp_blob(d).collect()
    # a non-ASCII char BEYOND the consumed prefix is harmless:
    # doc_id 0 -> w=2, h=1 -> 6 pixel bytes; the é sits at index 6
    d2 = spark.createDataFrame(
        [(0, "abcdefé tail")], "doc_id long, text string"
    )
    assert attach_bmp_blob(d2).count() == 1


def test_mm01_decodes_planted_bmps(spark):
    """mm01 end to end on a tiny frame: dims parsed from the header,
    pixel md5 equals the text padded to the frame — computed
    independently here, not by re-running the decoder."""
    import hashlib

    from alternating_least_squares_spark.functions.multimodal import (
        attach_bmp_blob,
        decode_bmp_features,
    )

    # doc_id 7: w = 7%4+2 = 5, h = 7%3+1 = 2 -> 30 pixel bytes
    d = spark.createDataFrame(
        [(7, "hello bmp"), (12, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["width"], r["height"], r["pixel_md5"])
        for r in decode_bmp_features(attach_bmp_blob(d)).collect()
    }
    exp7 = hashlib.md5(b"hello bmp" + b"x" * 21).hexdigest()
    # w=5 -> row 15 bytes + 1 pad = 16; 54 + 2*16 = 86
    assert got[7] == (86, 5, 2, exp7)
    # doc 12: w=2, h=1, NULL text -> all-'x' pixels; row 6+2 pad
    assert got[12] == (62, 2, 1, hashlib.md5(b"x" * 6).hexdigest())


def test_resize_bmp_nearest_hand_computed(spark):
    """3x2 -> 2x2 nearest-neighbor: sampled sources are (0,0), (1,0),
    (0,1), (1,1) = pixels at grid (sx, sy) with sx in {0, 3//2=1} and
    sy in {0, 2//2=1} - verified against the hand-picked bytes, and
    the re-encoded container is a decodable BMP of the right size."""
    import hashlib

    from alternating_least_squares_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_bmp_nearest,
    )

    # 3x2 image: pixel (x,y) = bytes (3 chars) from 'abcdefghijklmnopqr'
    px = b"abcdefghijklmnopqr"  # rows: [abc def ghi], [jkl mno pqr]
    blob = encode_bmp(px, 3, 2)
    df = spark.createDataFrame([(7, bytearray(blob))],
                               "doc_id long, blob binary")
    row = resize_bmp_nearest(df, out_w=2, out_h=2).collect()[0]
    assert (row["src_width"], row["src_height"]) == (3, 2)
    assert (row["width"], row["height"]) == (2, 2)
    # (0,0)->'abc'  (1,0)->sx=1*3//2=1 -> 'def'
    # (0,1)->sy=1*2//2=1 -> 'jkl'  (1,1)->'mno'
    expect = b"abcdefjklmno"
    assert row["resized_md5"] == hashlib.md5(expect).hexdigest()
    # re-encoded container: 54 header + 2 rows of stride 8
    assert row["resized_bmp_bytes"] == 70
    # and the emitted size matches what a fresh encode round-trips to
    w2, h2, rpx = decode_bmp(encode_bmp(expect, 2, 2))
    assert (w2, h2, rpx) == (2, 2, expect)


def test_resize_bmp_nearest_validates_target(spark):
    import pytest as _pytest

    from alternating_least_squares_spark.functions.multimodal import (
        resize_bmp_nearest,
    )

    df = spark.createDataFrame([(1, bytearray(b""))],
                               "doc_id long, blob binary")
    with _pytest.raises(ValueError):
        resize_bmp_nearest(df, out_w=0, out_h=2)


def test_pcm_roundtrip_matches_python_reference(spark):
    """attach → Arrow boundary → decode → frame features equals a
    pure-Python replay of the planted waveform (exact integers,
    variable 3-5 frame lengths)."""
    from alternating_least_squares_spark.functions.multimodal import (
        PCM_FRAME,
        attach_pcm_blob,
        pcm_frame_features,
        pcm_samples,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 17, 1000)], "doc_id long"
    )
    got = {
        (r["doc_id"], r["frame_idx"]): (r["energy"], r["peak"])
        for r in pcm_frame_features(attach_pcm_blob(docs)).collect()
    }
    want = {}
    for i in (0, 1, 2, 3, 17, 1000):
        s = pcm_samples(i)
        assert len(s) % PCM_FRAME == 0 and len(s) // PCM_FRAME in (3, 4, 5)
        for k in range(len(s) // PCM_FRAME):
            w = s[k * PCM_FRAME : (k + 1) * PCM_FRAME]
            want[(i, k)] = (sum(x * x for x in w), max(abs(x) for x in w))
    assert got == want


def test_pcm_features_fail_loud_on_corrupt_streams(spark):
    """Odd byte counts and non-frame-aligned streams raise instead of
    silently truncating (the b06 quarantine pattern is the opt-in for
    tolerating corruption)."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from alternating_least_squares_spark.functions.multimodal import (
        pcm_frame_features,
    )

    odd = spark.createDataFrame(
        [(1, bytearray(b"abc"))], "doc_id long, pcm binary"
    )
    with pytest.raises(PythonException, match="odd PCM byte count"):
        pcm_frame_features(odd).collect()
    ragged = spark.createDataFrame(
        [(1, bytearray(b"ab" * 17))], "doc_id long, pcm binary"
    )
    with pytest.raises(PythonException, match="not .*frame-aligned"):
        pcm_frame_features(ragged).collect()
    null_blob = spark.createDataFrame(
        [(1, None)], "doc_id long, pcm binary"
    )
    with pytest.raises(PythonException, match="NULL PCM payload"):
        pcm_frame_features(null_blob).collect()


def test_wav_container_roundtrip_and_chunk_walk():
    """encode_wav → decode_wav round trip, and the decoder's chunk
    WALK: a LIST metadata chunk injected between fmt and data (what
    real recorders emit) must be skipped by declared size — including
    the RIFF odd-size pad byte."""
    import struct

    from alternating_least_squares_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
        pcm_samples,
    )

    s = pcm_samples(12345)
    pcm = struct.pack(f"<{len(s)}h", *s)
    wav = encode_wav(pcm, 44100)
    rate, got = decode_wav(wav)
    assert (rate, got) == (44100, pcm)

    # splice an ODD-sized LIST chunk between fmt and data; the RIFF
    # pad byte after it must be honored or the walk derails
    fmt_end = wav.index(b"data")
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
    spliced = wav[:fmt_end] + meta + wav[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert decode_wav(spliced) == (44100, pcm)


def test_wav_decoder_fails_loud_on_malformed_containers():
    import struct

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    wav = encode_wav(b"\x01\x02" * 8, 8000)
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        decode_wav(b"JUNK" + wav[4:])
    with pytest.raises(ValueError, match="truncated RIFF"):
        decode_wav(wav[:-4])
    # stereo / non-PCM / non-16-bit all refuse rather than mis-decode
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + stereo_fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    stereo = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="16-bit mono PCM only"):
        decode_wav(stereo)
    no_data = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_wav(no_data)


def test_wav_features_parse_the_planted_container(spark):
    """mm07's profile equals a Python replay: rate parsed from the
    header, duration in exact integer micros."""
    from alternating_least_squares_spark.functions.multimodal import (
        attach_wav_blob,
        pcm_samples,
        wav_features,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 1, 2, 8)], "doc_id long")
    got = {
        r["doc_id"]: (
            r["sample_rate"], r["n_samples"], r["duration_us"],
            r["energy"], r["peak"],
        )
        for r in wav_features(attach_wav_blob(docs)).collect()
    }
    want = {}
    for i in (0, 1, 2, 8):
        s = pcm_samples(i)
        rate = 8000 * (1 + i % 3)
        want[i] = (
            rate, len(s), len(s) * 1_000_000 // rate,
            sum(x * x for x in s), max(abs(x) for x in s),
        )
    assert got == want


def test_wav_decoder_rejects_zero_rate():
    """A crafted fmt chunk with sample_rate=0 must raise at DECODE,
    not zero-divide in the first duration computation downstream."""
    import struct

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        decode_wav,
    )

    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="bad sample rate"):
        decode_wav(wav)


def test_wav_decoder_ignores_trailing_bytes_and_rejects_duplicates():
    """The chunk walk stops at the declared RIFF extent: a forged
    data chunk APPENDED past it must not replace the real PCM (review
    r14 — it used to), while a duplicate fmt/data chunk WITHIN the
    extent raises; encode_wav refuses rates that overflow the fmt
    byte-rate field instead of leaking struct.error."""
    import struct

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    pcm = b"\x01\x02" * 8
    wav = encode_wav(pcm, 8000)
    forged = wav + b"data" + struct.pack("<I", 2) + b"\x99\x99"
    assert decode_wav(forged) == (8000, pcm)  # forgery ignored
    assert decode_wav(wav + b"junk-padding") == (8000, pcm)

    # duplicate data chunk inside the declared extent
    extra = b"data" + struct.pack("<I", 2) + b"\x99\x99"
    body = wav[8:] + extra
    dup = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="duplicate data chunk"):
        decode_wav(dup)

    with pytest.raises(ValueError, match="exceeds WAV range"):
        encode_wav(pcm, 2**31)


def test_p05_twins_are_dropped_by_dedup_not_by_gates(spark):
    """p05's exact-dup collapse is doing the work: every +20M twin is
    byte-identical to its base, so it PASSES/FAILS the gates exactly
    as the base does — the twin of an admitted base must be absent
    from the output because keep-one dropped it, not because a gate
    did; and no admitted id is ever a twin."""
    from alternating_least_squares_spark.registry import (
        P05_ENERGY_MIN,
        P05_PEAK_MAX,
        q_p05_audio_curation,
    )
    from alternating_least_squares_spark.functions.multimodal import (
        pcm_samples,
    )
    from tests.conftest import SF_SMALL

    admitted = {
        r["doc_id"]
        for r in q_p05_audio_curation(spark, SF_SMALL).collect()
    }
    assert admitted and all(d < 20_000_000 for d in admitted)
    # at least one admitted base HAS a twin whose identical waveform
    # passes both gates — proof the dedup (not a gate) excluded it
    twinned_admitted = [d for d in admitted if d % 10 == 0]
    assert twinned_admitted
    for d in twinned_admitted[:5]:
        s = pcm_samples(d)  # == the twin's waveform, byte-identical
        assert max(abs(x) for x in s) < P05_PEAK_MAX
        assert sum(x * x for x in s) >= len(s) * P05_ENERGY_MIN


def test_pcm_samples_not_periodic_in_doc_id():
    """Round-15 regression: the pre-r15 waveform collapsed to
    ``(7919*d mod 65536, d mod 3)`` and repeated with period 196608
    in doc_id — two unrelated docs past ~196k ids planted
    byte-identical WAVs, silently breaking p05's by-construction
    dedup ground truth at large SF. The high-bits term
    ``i*i*(d//65536)`` makes the waveform injective below 2^32:
    sample 0 pins ``7919*d mod 65536``, the first difference pins
    ``d//65536 mod 65536``, the length pins ``d mod 3``."""
    from alternating_least_squares_spark.functions.multimodal import (
        pcm_samples,
    )

    # the exact collision class the advisor exhibited (d, d+196608)
    for d in (0, 1, 7919, 123456):
        assert pcm_samples(d) != pcm_samples(d + 196608)
    # injectivity spot-check across a mix of low/high ids, including
    # p05's +20M twin offset region
    ids = [0, 1, 2, 65536, 65537, 196608, 196609, 20_000_000,
           20_196_608, 2**31, 2**31 + 196608]
    waves = {tuple(pcm_samples(d)) for d in ids}
    assert len(waves) == len(ids)
    # algebraic recovery: sample 0 and the first difference identify
    # (d mod 65536, d//65536 mod 65536) — the injectivity proof
    for d in ids:
        s = pcm_samples(d)
        assert (s[0] + 32768) % 65536 == (d * 7919 + 12345) % 65536
        assert (s[1] - s[0]) % 65536 == (104729 + d // 65536) % 65536


def test_encode_wav_rejects_oversized_payload_with_valueerror():
    """ADVICE r15 regression: a PCM payload whose data chunk or RIFF
    body size overflows the 32-bit '<I' fields must raise ValueError
    (the module's documented crash-class contract), not struct.error.
    Uses a len-faking bytes subclass so the test doesn't allocate
    4 GiB — the guard fires on len() alone, before any packing."""
    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        encode_wav,
    )

    class _HugeLen(bytes):
        def __len__(self):
            return 0xFFFFFFFF - 35  # even, and one past the RIFF limit

    with pytest.raises(ValueError, match="exceeds WAV range"):
        encode_wav(_HugeLen(), 8000)
    # the boundary itself still encodes-by-contract: a len exactly at
    # the limit passes the guard (struct fields fit)
    assert encode_wav(b"", 8000)  # trivially under the limit


def test_png_roundtrip_all_filters_and_channels():
    """decode_png inverts encode_png for every filter type 0-4, both
    RGB and RGBA, including mixed per-row filters — the arithmetic
    the mm08 oracle hash rides on."""
    import os

    from alternating_least_squares_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    px = bytes((i * 37 + 11) % 256 for i in range(4 * 3 * 3))
    for f in range(5):
        blob = encode_png(px, 4, 3, 3, [f] * 3)
        assert decode_png(blob) == (4, 3, 3, px), f
    rgba = os.urandom(5 * 4 * 4)
    blob = encode_png(rgba, 5, 4, 4, [4, 3, 2, 1])
    assert decode_png(blob) == (5, 4, 4, rgba)
    # ancillary chunks in the walk are skipped (tEXt between IHDR
    # and IDAT, where real encoders put metadata)
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig_ihdr_end = blob.index(b"IDAT") - 4
    with_text = (
        blob[:sig_ihdr_end]
        + chunk(b"tEXt", b"Comment\x00hi")
        + blob[sig_ihdr_end:]
    )
    assert decode_png(with_text) == (5, 4, 4, rgba)


def test_png_decoder_fails_loud_on_malformed_containers():
    """The 955f6ac fuzz discipline for PNG: every malformation class
    raises ValueError (the module's single crash class) — bad
    signature, truncated chunks, CRC corruption, unsupported IHDR
    shapes (palette / 16-bit / interlaced), unknown critical chunks,
    corrupt or wrong-sized IDAT, bad filter bytes."""
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    px = bytes(range(2 * 2 * 3))
    good = encode_png(px, 2, 2, 3, [1, 2])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(good[:-6])
    # flip one IDAT payload byte -> CRC mismatch, never wrong pixels
    idat_at = good.index(b"IDAT")
    corrupt = bytearray(good)
    corrupt[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupt))
    # unsupported IHDR shapes refuse rather than mis-decode (palette
    # moved OUT of this list in round 16, Adam7 interlace and 16-bit
    # depth in round 17 — all real decode paths now, see
    # test_palette_png_* / test_adam7_* / test_16bit_png_*)
    for depth, color, interlace in (
        (8, 0, 0),    # grayscale
        (16, 0, 0),   # 16-bit grayscale
        (4, 2, 0),    # sub-byte depth
        (16, 3, 0),   # 16-bit palette (spec-illegal)
        (8, 2, 2),    # unknown interlace method
    ):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        blob = (
            PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="supported"):
            decode_png(blob)
    # unknown CRITICAL chunk (uppercase first letter) must refuse
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"CXYZ", b"??")
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported critical chunk"):
        decode_png(blob)
    # corrupt deflate stream and wrong decoded size both refuse
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\xde\xad\xbe\xef")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        decode_png(blob)
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 9))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT decodes to"):
        decode_png(blob)
    # filter byte > 4
    bad_scan = b"\x07" + b"\x00" * 6 + b"\x00" * 7
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bad_scan))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bad scanline filter"):
        decode_png(blob)
    # missing IEND (walk runs off the end)
    no_end = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 14)
    )
    with pytest.raises(ValueError, match="missing IHDR or IEND"):
        decode_png(no_end)


def test_png_decoder_junk_fuzz_crash_class():
    """Deterministic junk fuzz: random bytes (seeded) must ALWAYS
    raise ValueError — never a different exception, never a silent
    wrong decode."""
    import random

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
    )

    rng = random.Random(1508)
    for n in (0, 1, 8, 16, 64, 256):
        for _ in range(20):
            blob = bytes(rng.randrange(256) for _ in range(n))
            with pytest.raises(ValueError):
                decode_png(blob)
            with pytest.raises(ValueError):
                decode_png(PNG_SIG + blob)


def test_png_decoder_strictness_and_bomb_cap():
    """ADVICE r15 hardening: (1) the inflate is capped at the
    IHDR-implied size so a few-KB deflate bomb raises before
    allocating its full output; (2) IHDR height is bounded like
    width; (3) encode_png guards the '>I' range with ValueError, not
    struct.error; (4) trailing bytes after IEND and non-consecutive
    IDAT chunks refuse (spec strictness) while spec-legal
    consecutive split IDATs still decode."""
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # 2x2 RGB, want=14

    # (1) deflate bomb: ~10 KB of compressed zeros inflating to 10 MB
    # against a 14-byte claim must raise, not allocate 10 MB first
    bomb = zlib.compress(b"\x00" * 10_000_000)
    assert len(bomb) < 16_384
    blob = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT decodes past"):
        decode_png(blob)

    # (2) height past the signed-32 bound refuses like width does
    tall = struct.pack(">IIBBBBB", 2, 0x80000000, 8, 2, 0, 0, 0)
    blob = (
        PNG_SIG + chunk(b"IHDR", tall)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="malformed PNG dimensions"):
        decode_png(blob)

    # (3) encode_png '>I' guard: ValueError, the module's crash class
    with pytest.raises(ValueError, match="exceed the PNG"):
        encode_png(b"", 0x1_0000_0000, 5, 3)
    with pytest.raises(ValueError, match="exceed the PNG"):
        encode_png(b"", 5, 0x1_0000_0000, 3)

    # (4a) trailing garbage after IEND refuses
    px = bytes(range(2 * 2 * 3))
    good = encode_png(px, 2, 2, 3, [1, 2])
    with pytest.raises(ValueError, match="trailing bytes after IEND"):
        decode_png(good + b"JUNK")

    # (4b) IDAT split across consecutive chunks is spec-legal and decodes
    scan = zlib.compress(
        b"\x00" + px[:6] + b"\x00" + px[6:]
    )
    split = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", scan[:5]) + chunk(b"IDAT", scan[5:])
        + chunk(b"IEND", b"")
    )
    assert decode_png(split) == (2, 2, 3, px)

    # (4c) an ancillary chunk between IDATs refuses
    interleaved = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", scan[:5])
        + chunk(b"tEXt", b"Comment\x00hi")
        + chunk(b"IDAT", scan[5:])
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="non-consecutive IDAT"):
        decode_png(interleaved)


def test_palette_png_roundtrip_all_filters():
    """decode_png inverts encode_png in palette mode for every filter
    type 0-4 and mixed per-row filters, returning the PLTE-EXPANDED
    RGB buffer (the PIL convert('RGB') contract) — the arithmetic the
    mm09 oracle hash rides on, including the bpp=1 predictor (a
    decoder unfiltering at bpp=3 reconstructs wrong indices)."""
    from alternating_least_squares_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    pal = [(10 * j + 5, 200 - j, j) for j in range(7)]
    idx = bytes((i * 3 + 1) % 7 for i in range(5 * 4))
    want = bytes(c for i in idx for c in pal[i])
    for f in range(5):
        blob = encode_png(idx, 5, 4, row_filters=[f] * 4, palette=pal)
        assert decode_png(blob) == (5, 4, 3, want), f
    blob = encode_png(idx, 5, 4, row_filters=[4, 3, 2, 1], palette=pal)
    assert decode_png(blob) == (5, 4, 3, want)
    # single-entry palette (all pixels one color) is legal
    blob = encode_png(b"\x00" * 6, 3, 2, palette=[(9, 8, 7)])
    assert decode_png(blob) == (3, 2, 3, bytes([9, 8, 7]) * 6)


def test_palette_png_crash_classes():
    """Malformed-PLTE classes all raise ValueError (the 955f6ac fuzz
    discipline): color type 3 without PLTE, duplicate PLTE, PLTE
    after IDAT, bad PLTE length (0 / not %3 / >768), out-of-range
    index in the decoded scanlines, and encode-side guards (bad
    entries, oversized palette, index past the palette)."""
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    pal = [(65, 65, 65), (66, 66, 66)]
    good = encode_png(b"\x00\x01\x01\x00", 2, 2, palette=pal)
    ihdr3 = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    idat = zlib.compress(b"\x00\x00\x01" + b"\x00\x01\x00")

    # color 3 without PLTE
    blob = PNG_SIG + chunk(b"IHDR", ihdr3) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="without a PLTE"):
        decode_png(blob)
    # duplicate PLTE
    plte = chunk(b"PLTE", b"AAABBB")
    blob = PNG_SIG + chunk(b"IHDR", ihdr3) + plte + plte + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="duplicate PLTE"):
        decode_png(blob)
    # PLTE after IDAT
    blob = PNG_SIG + chunk(b"IHDR", ihdr3) + chunk(b"IDAT", idat) + plte + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="PLTE after IDAT"):
        decode_png(blob)
    # bad PLTE lengths: empty, not a multiple of 3, > 768
    for bad in (b"", b"AAAB", b"x" * 771):
        blob = (
            PNG_SIG + chunk(b"IHDR", ihdr3) + chunk(b"PLTE", bad)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="malformed PLTE length"):
            decode_png(blob)
    # decoded index past the PLTE (2 entries, index 2 planted)
    idat_oob = zlib.compress(b"\x00\x00\x02" + b"\x00\x01\x00")
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr3) + plte
        + chunk(b"IDAT", idat_oob) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index 2 out of range"):
        decode_png(blob)
    # encode-side guards
    with pytest.raises(ValueError, match="palette must hold 1-256"):
        encode_png(b"\x00", 1, 1, palette=[])
    with pytest.raises(ValueError, match="palette must hold 1-256"):
        encode_png(b"\x00", 1, 1, palette=[(0, 0, 0)] * 257)
    with pytest.raises(ValueError, match="bad palette entry"):
        encode_png(b"\x00", 1, 1, palette=[(0, 0)])
    with pytest.raises(ValueError, match="bad palette entry"):
        encode_png(b"\x00", 1, 1, palette=[(0, 0, 256)])
    with pytest.raises(ValueError, match="index 1 out of range"):
        encode_png(b"\x00\x01", 2, 1, palette=[(0, 0, 0)])
    # PLTE on a truecolor PNG is spec-legal (suggested quantization)
    # and ignored
    sig_ihdr_end = good.index(b"PLTE") - 4  # reuse good's IHDR prefix? no:
    rgb = encode_png(bytes(range(12)), 2, 2, 3)
    at = rgb.index(b"IDAT") - 4
    with_plte = rgb[:at] + chunk(b"PLTE", b"AAABBB") + rgb[at:]
    assert decode_png(with_plte) == (2, 2, 3, bytes(range(12)))


def test_palette_png_junk_fuzz_crash_class():
    """Seeded junk after a valid IHDR+PLTE prefix must always raise
    ValueError — never a different exception, never a wrong decode."""
    import random
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    prefix = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", b"AAABBB")
    )
    rng = random.Random(1609)
    for n in (1, 8, 16, 64):
        for _ in range(20):
            blob = prefix + bytes(rng.randrange(256) for _ in range(n))
            with pytest.raises(ValueError):
                decode_png(blob)


def test_png_decoder_truncated_stream_and_impossible_expansion():
    """Review r16 regressions on the capped inflate: (1) an IDAT
    whose zlib terminator was chopped off must still refuse (the
    capped decompressobj, unlike plain zlib.decompress, returns the
    full output with eof=False); (2) an IHDR claiming more output
    than deflate's 1032:1 maximum expansion allows must refuse
    BEFORE inflating (the cap is otherwise attacker-controlled)."""
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    px = bytes(range(2 * 2 * 3))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    stream = zlib.compress(b"\x00" + px[:6] + b"\x00" + px[6:])
    # (1) chop the 4-byte adler32 trailer: output complete, stream not
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", stream[:-4]) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated IDAT stream"):
        decode_png(blob)
    # (2) huge claimed dimensions vs a tiny IDAT refuse up front
    huge = struct.pack(">IIBBBBB", 0x7FFFFFFF, 0x7FFFFFFF, 8, 2, 0, 0, 0)
    blob = (
        PNG_SIG + chunk(b"IHDR", huge)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 100)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="impossible expansion"):
        decode_png(blob)
    # the guard must not reject legitimate images
    good = encode_png(px, 2, 2, 3, [1, 2])
    assert decode_png(good) == (2, 2, 3, px)


def test_p06_twins_dropped_by_dedup_and_stats_match_contract(spark):
    """p06 mirror of the p05 twin pin: every +20M twin is
    byte-identical to its base (the blob is seed-driven), so it gates
    identically and must be absent from the output because keep-one
    dropped it — no admitted id is ever a twin, and at least one
    admitted base HAS a twin (proof the dedup, not a gate, excluded
    it). The admitted set equals the analytic gate evaluation over
    the shared pixel contract, and both gates are evidential (each
    fails a nonempty slice)."""
    from alternating_least_squares_spark.functions.multimodal import (
        seeded_png_pixel,
    )
    from alternating_least_squares_spark.registry import (
        P06_MEAN_MIN,
        P06_RANGE_MIN,
        q_p06_image_curation,
    )
    from alternating_least_squares_spark.sources import load_table
    from tests.conftest import SF_SMALL

    admitted = {
        r["doc_id"]
        for r in q_p06_image_curation(spark, SF_SMALL).collect()
    }
    assert admitted and all(d < 20_000_000 for d in admitted)
    assert [d for d in admitted if d % 10 == 0]  # some twinned bases

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id").collect()
    ]

    def stats(s):
        n = (s % 4 + 2) * (s % 3 + 1) * (3 + s % 2)
        b = [seeded_png_pixel(s, i) for i in range(n)]
        return n, sum(b), min(b), max(b)

    want, fail_mean, fail_range = set(), 0, 0
    for d in ids:
        n, sm, lo, hi = stats(d)
        dark_ok = sm >= n * P06_MEAN_MIN
        contrast_ok = hi - lo >= P06_RANGE_MIN
        fail_mean += not dark_ok
        fail_range += not contrast_ok
        if dark_ok and contrast_ok:
            want.add(d)
    assert admitted == want
    assert fail_mean and fail_range  # both gates evidential


from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=40, deadline=None)
@given(
    w=hst.integers(1, 9),
    h=hst.integers(1, 6),
    mode=hst.sampled_from(["rgb", "rgba", "palette"]),
    interlace=hst.booleans(),
    deep=hst.booleans(),
    fseed=hst.integers(0, 10**9),
    pxseed=hst.integers(0, 10**9),
    psize=hst.integers(1, 17),
)
def test_png_roundtrip_property(
    w, h, mode, interlace, deep, fseed, pxseed, psize
):
    """Any dimensions, any per-row filter assignment, any pixel
    content, all three color modes, interlaced or sequential:
    decode_png(encode_png(x)) == x (with palette mode comparing
    against the analytic PLTE expansion). Deterministic content
    derived from the drawn seeds — the property the fixed-case tests
    sample, stated in full. Small drawn dims make Adam7 pass
    EMPTINESS vary across examples (w<5 kills pass 2, h<5 pass 3,
    ...), so the empty-pass arithmetic is inside the property."""
    from alternating_least_squares_spark.functions.multimodal import (
        _adam7_passes,
        decode_png,
        encode_png,
    )

    n_rows = (
        sum(hp for *_, hp in _adam7_passes(w, h)) if interlace else h
    )
    filters = [(fseed // (5**r)) % 5 for r in range(n_rows)]
    if mode == "palette":
        pal = [
            tuple((pxseed // (7 ** (3 * j + c))) % 256 for c in range(3))
            for j in range(psize)
        ]
        idx = bytes(
            (pxseed // (3 ** (i % 20)) + i) % psize for i in range(w * h)
        )
        blob = encode_png(
            idx, w, h, row_filters=filters, palette=pal, interlace=interlace
        )
        want = bytes(c for i in idx for c in pal[i])
        assert decode_png(blob) == (w, h, 3, want)
    else:
        ch = 3 if mode == "rgb" else 4
        depth = 16 if deep else 8
        px = bytes(
            (pxseed // (3 ** (i % 20)) + i * 31) % 256
            for i in range(w * h * ch * (depth // 8))
        )
        blob = encode_png(
            px, w, h, ch, row_filters=filters, interlace=interlace,
            depth=depth,
        )
        assert decode_png(blob) == (w, h, ch, px)


def test_png_idat_trailing_zlib_garbage_refuses():
    """ADVICE r16: bytes inside IDAT after the zlib stream terminator
    must refuse even when the inflated output is exactly ``want``
    bytes — plain zlib.decompress tolerated this silently; the spec
    says the stream fills the IDAT data exactly."""
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    px = bytes(range(2 * 2 * 3))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    scan = zlib.compress(b"\x00" + px[:6] + b"\x00" + px[6:])
    clean = (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", scan)
        + chunk(b"IEND", b"")
    )
    assert decode_png(clean) == (2, 2, 3, px)
    dirty = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", scan + b"\xde\xad\xbe\xef")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="trailing bytes inside IDAT"):
        decode_png(dirty)
    # the same garbage split into a SECOND consecutive IDAT chunk is
    # the identical stream to the decompressor — also refused
    dirty2 = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", scan) + chunk(b"IDAT", b"\xde\xad")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="trailing bytes inside IDAT"):
        decode_png(dirty2)


def test_encode_png_palette_channels_conflict_refuses():
    """ADVICE r16: palette mode forces color type 3 / bpp 1, so a
    caller passing channels=4 alongside a palette must get a loud
    ValueError, not a structurally different PNG."""
    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        encode_png,
    )

    pal = [(1, 2, 3), (4, 5, 6)]
    with pytest.raises(ValueError, match="conflicts with palette mode"):
        encode_png(b"\x00\x01", 2, 1, 4, palette=pal)
    # the default (3) stays accepted, keyword or omitted
    assert encode_png(b"\x00\x01", 2, 1, palette=pal)
    assert encode_png(b"\x00\x01", 2, 1, 3, palette=pal)


def test_twin_domain_guard_rejects_out_of_range_ids(spark, tmp_path):
    """ADVICE r16: the p05/p06 twin-id-domain guard must trip on
    NEGATIVE doc_ids too (a negative base could alias into the base
    domain after +20M, and seed-byte extraction vs the oracle's
    ``%``/``//`` arithmetic diverge below 0), not just on ids at or
    above the offset."""
    import pytest

    from alternating_least_squares_spark.registry import (
        q_p05_audio_curation,
        q_p06_image_curation,
    )

    for bad, frag in ((-1, "p05"), (25_000_000, "p05")):
        d = tmp_path / f"sf_{frag}_{bad}"
        spark.createDataFrame(
            [(bad, "t", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(d / "documents.parquet"))
        with pytest.raises(ValueError, match="twin id domain"):
            q_p05_audio_curation(spark, str(d))
        with pytest.raises(ValueError, match="twin id domain"):
            q_p06_image_curation(spark, str(d))


def test_adam7_interlaced_roundtrip_and_geometry():
    """mm10's codec contract: Adam7 encode/decode inverts across dims
    that populate all seven passes (8×8+), miss later-origin passes
    (tiny dims), and every color mode — and the pass geometry helper
    matches the spec's ceiling arithmetic (empty passes contribute
    zero scanlines AND zero filter bytes)."""
    import itertools
    import random

    from alternating_least_squares_spark.functions.multimodal import (
        _adam7_passes,
        decode_png,
        encode_png,
    )

    # spec geometry pins: 8x8 populates all 7 passes with 1/1/2/4/8/
    # 16/32 pixels; 1x1 is pass 1 alone; 4x4 misses pass 2 (x0=4);
    # 3x1 keeps only passes 1 and 6 of the first scanline group
    assert [wp * hp for *_, wp, hp in _adam7_passes(8, 8)] == [
        1, 1, 2, 4, 8, 16, 32
    ]
    assert len(_adam7_passes(1, 1)) == 1
    assert all(x0 != 4 for x0, *_ in _adam7_passes(4, 4))
    assert sum(wp * hp for *_, wp, hp in _adam7_passes(3, 1)) == 3

    rng = random.Random(1707)
    for w, h, ch in itertools.product(
        [1, 2, 4, 5, 8, 9, 16], [1, 2, 4, 5, 8, 9], [3, 4]
    ):
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        n = sum(hp for *_, hp in _adam7_passes(w, h))
        filters = [rng.randrange(5) for _ in range(n)]
        blob = encode_png(px, w, h, ch, row_filters=filters, interlace=True)
        assert decode_png(blob) == (w, h, ch, px), (w, h, ch)
    # palette + interlace composes
    pal = [(j, 255 - j, (j * 3) % 256) for j in range(11)]
    for w, h in [(1, 1), (3, 2), (8, 8), (10, 5)]:
        idx = bytes(rng.randrange(11) for _ in range(w * h))
        n = sum(hp for *_, hp in _adam7_passes(w, h))
        blob = encode_png(
            idx, w, h,
            row_filters=[rng.randrange(5) for _ in range(n)],
            palette=pal, interlace=True,
        )
        want = bytes(c for i in idx for c in pal[i])
        assert decode_png(blob) == (w, h, 3, want), (w, h)


def test_adam7_crash_classes():
    """Malformed interlaced PNGs raise ValueError (the fuzz
    discipline): wrong stream length for the interlaced scanline
    layout, bad filter byte inside a LATER pass, interlace method 2+,
    and encode-side row_filters count mismatch naming the interlaced
    expectation."""
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        _adam7_passes,
        decode_png,
        encode_png,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # 4x4 RGB interlaced: passes 1,3,4,5,6,7 -> want = sum((wp*3+1)*hp)
    w = h = 4
    want = sum((wp * 3 + 1) * hp for *_, wp, hp in _adam7_passes(w, h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)

    # non-interlaced-sized stream under an interlace=1 IHDR mismatches
    seq = zlib.compress(b"\x00" + bytes(12) + (b"\x00" + bytes(12)) * 3)
    blob = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", seq) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(blob)

    # right length, but a 7 filter byte inside the LAST pass
    scan = bytearray(want)
    off = 0
    for *_, wp, hp in _adam7_passes(w, h):
        off += (wp * 3 + 1) * hp
    scan[off - (4 * 3 + 1)] = 7  # first filter byte of pass 7's last row
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bad scanline filter type"):
        decode_png(blob)

    # interlace method 2 refuses through the loud gate
    ihdr2 = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 2)
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr2)
        + chunk(b"IDAT", zlib.compress(bytes(want)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        decode_png(blob)

    # encode-side: wrong row_filters length names the interlaced count
    with pytest.raises(ValueError, match="interlaced scanline count"):
        encode_png(bytes(w * h * 3), w, h, row_filters=[0] * h, interlace=True)


def test_16bit_png_roundtrip_and_crash_classes():
    """mm11's codec contract: depth=16 encode/decode inverts (raw
    big-endian 2-byte-sample buffer) across dims/channels, sequential
    AND Adam7-interlaced — the filters must predict at bpp=2×channels
    (an 8-bit-offset predictor reconstructs garbage, which the
    roundtrip would catch); 16-bit palette refuses on BOTH sides
    (spec 11.2.2), and non-8/16 depths refuse."""
    import itertools
    import random
    import struct
    import zlib

    import pytest

    from alternating_least_squares_spark.functions.multimodal import (
        PNG_SIG,
        _adam7_passes,
        decode_png,
        encode_png,
    )

    rng = random.Random(1711)
    for w, h, ch, inter in itertools.product(
        [1, 3, 5, 8, 9], [1, 2, 5, 8], [3, 4], [False, True]
    ):
        px = bytes(rng.randrange(256) for _ in range(w * h * ch * 2))
        n = sum(hp for *_, hp in _adam7_passes(w, h)) if inter else h
        blob = encode_png(
            px, w, h, ch,
            row_filters=[rng.randrange(5) for _ in range(n)],
            interlace=inter, depth=16,
        )
        assert decode_png(blob) == (w, h, ch, px), (w, h, ch, inter)

    with pytest.raises(ValueError, match="depth must be"):
        encode_png(b"\x00" * 3, 1, 1, depth=12)
    with pytest.raises(ValueError, match="depths"):
        encode_png(b"\x00", 1, 1, depth=16, palette=[(0, 0, 0)])

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    # a hand-built 16-bit PALETTE IHDR refuses through the loud gate
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", b"\x00\x00\x00")
        + chunk(b"IDAT", zlib.compress(b"\x00" * 3)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="supported"):
        decode_png(blob)
    # truncated 16-bit stream (8-bit-sized payload under a 16-bit
    # IHDR) refuses on the stream-size contract
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" + bytes(6) + b"\x00" + bytes(6)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(blob)


# ------------------------------------------------------------- mm12 JPEG


def _jpeg_planted(doc_id: int) -> tuple[bytes, int, int, int]:
    """The mm12 planted fixture (tile-constant, the exactness class)."""
    from alternating_least_squares_spark.functions.multimodal import (
        jpeg_tile_value,
    )

    w, h = 8 * (doc_id % 2 + 1), 8 * (doc_id % 3 + 1)
    ch = 1 if doc_id % 2 == 0 else 3
    px = bytearray()
    for yy in range(h):
        for xx in range(w):
            tx, ty = xx // 8, yy // 8
            if ch == 1:
                px.append(jpeg_tile_value(doc_id, tx, ty, -1))
            else:
                px += bytes(
                    jpeg_tile_value(doc_id, tx, ty, c) for c in range(3)
                )
    return bytes(px), w, h, ch


def test_jpeg_tile_constant_roundtrip_is_exact():
    """The mm12 exactness construction: 8x8-tile-constant images have
    only a DC coefficient, and the pinned DC step of 8 makes the DC
    path lossless — grayscale decodes to the EXACT planted bytes, and
    color to the exact fixed-point YCbCr roundtrip of them."""
    from alternating_least_squares_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_rgb_to_ycc,
        jpeg_ycc_to_rgb,
    )

    for doc_id in range(30):
        px, w, h, ch = _jpeg_planted(doc_id)
        got = decode_jpeg(encode_jpeg(px, w, h, ch))
        if ch == 1:
            assert got == (w, h, 1, px)
        else:
            exp = bytearray()
            for i in range(0, len(px), 3):
                exp += bytes(
                    jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(*px[i : i + 3]))
                )
            assert got == (w, h, 3, bytes(exp))


def test_jpeg_decode_inverts_encoder_on_random_images():
    """decode == encode⁻¹ on ARBITRARY images: the loss lives entirely
    in the encoder's quantize step, so the decoder must reproduce the
    encoder's predicted reconstruction BIT-EXACTLY — this drives the
    full Huffman AC path (runs, ZRL, EOB, high categories), DC
    prediction across blocks, edge-replicated partial MCUs, and the
    byte-stuffing writer/reader pair."""
    import random

    from alternating_least_squares_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_reconstruction,
    )

    rng = random.Random(1812)
    for trial in range(25):
        w = rng.randrange(1, 40)
        h = rng.randrange(1, 40)
        ch = rng.choice([1, 3])
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        got = decode_jpeg(encode_jpeg(px, w, h, ch))
        assert got == (w, h, ch, jpeg_reconstruction(px, w, h, ch)), (
            f"trial {trial}: {w}x{h}x{ch}"
        )


def test_jpeg_malformed_matrix():
    """Every malformation class refuses loudly (the mm07-mm11 gate
    discipline): bad signature, truncations, trailing bytes, restart
    intervals, progressive SOF, subsampling, 16-bit DQT, missing
    tables, markers inside the scan."""
    import pytest as _pytest

    from alternating_least_squares_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(bytes(range(64)), 8, 8, 1)

    def mutate(pat: bytes, repl: bytes) -> bytes:
        i = good.index(pat)
        return good[:i] + repl + good[i + len(pat):]

    cases = {
        "missing SOI": b"\x00\x00" + good[2:],
        "truncated header": good[:10],
        "truncated scan": good[:-12],
        "missing EOI": good[:-2],
        "trailing bytes": good + b"\x00",
        "EOI before SOS": good[:2] + b"\xff\xd9",
        "standalone RST in headers": good[:2] + b"\xff\xd0" + good[2:],
        # SOF0 0xffc0 -> progressive 0xffc2
        "progressive SOF": mutate(b"\xff\xc0", b"\xff\xc2"),
        # DRI segment inserted before SOS
        "restart interval": mutate(
            b"\xff\xda", b"\xff\xdd\x00\x04\x00\x01\xff\xda"
        ),
    }
    for name, blob in cases.items():
        with _pytest.raises(ValueError):
            decode_jpeg(blob)

    # 4:2:0 subsampling factor in SOF0 refuses
    i = good.index(b"\xff\xc0")
    sof = bytearray(good[i : i + 2 + 13])
    # marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1) -> samp at 11
    assert sof[11] == 0x11
    sof[11] = 0x22
    with _pytest.raises(ValueError, match="sampling"):
        decode_jpeg(good[:i] + bytes(sof) + good[i + 15 :])

    # 16-bit DQT precision refuses
    j = good.index(b"\xff\xdb")
    dqt = bytearray(good[j : j + 4 + 65])
    dqt[4] = 0x10
    with _pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(good[:j] + bytes(dqt) + good[j + 69 :])

    # encoder input validation
    for bad in (
        lambda: encode_jpeg(b"", 0, 0, 1),
        lambda: encode_jpeg(b"\x00" * 10, 2, 2, 1),
        lambda: encode_jpeg(b"\x00" * 16, 2, 2, 4),
    ):
        with _pytest.raises(ValueError):
            bad()


def test_jpeg_attach_decode_sparkside(spark):
    """The mm12 plumbing end-to-end through Arrow: planted blobs
    decode back to the planted (gray) / fixed-point-roundtripped
    (color) pixel md5s, with dims and channel counts parsed from the
    container."""
    import hashlib as _hl

    from alternating_least_squares_spark.functions.multimodal import (
        attach_jpeg_blob,
        decode_jpeg_features,
        jpeg_rgb_to_ycc,
        jpeg_ycc_to_rgb,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id").limit(40)
    got = {
        r["doc_id"]: (
            r["width"], r["height"], r["channels"], r["pixel_md5"]
        )
        for r in decode_jpeg_features(attach_jpeg_blob(docs)).collect()
    }
    assert len(got) == 40
    for doc_id, (w, h, ch, md) in got.items():
        px, ew, eh, ech = _jpeg_planted(doc_id)
        assert (w, h, ch) == (ew, eh, ech)
        if ch == 1:
            exp = px
        else:
            buf = bytearray()
            for i in range(0, len(px), 3):
                buf += bytes(
                    jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(*px[i : i + 3]))
                )
            exp = bytes(buf)
        assert md == _hl.md5(exp).hexdigest()


def test_mixed_media_dispatch_sparkside(spark):
    """mm13: a format-heterogeneous corpus (BMP/PNG/JPEG by id%3, all
    planted from the same RGB tile contract) decodes through ONE
    decode_image_features pass — BMP/PNG byte-exact, JPEG as the
    fixed-point roundtrip."""
    import hashlib as _hl

    from alternating_least_squares_spark.functions.multimodal import (
        attach_mixed_media_blob,
        decode_image_features,
        jpeg_rgb_to_ycc,
        jpeg_tile_value,
        jpeg_ycc_to_rgb,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id").limit(30)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["channels"], r["pixel_md5"])
        for r in decode_image_features(attach_mixed_media_blob(docs)).collect()
    }
    assert len(got) == 30
    for d, (w, h, ch, md) in got.items():
        ew, eh = 8 * (d % 2 + 1), 8 * ((d // 3) % 3 + 1)
        assert (w, h, ch) == (ew, eh, 3)
        exp = bytearray()
        for yy in range(eh):
            for xx in range(ew):
                tx, ty = xx // 8, yy // 8
                rgb = tuple(
                    jpeg_tile_value(d, tx, ty, c) for c in range(3)
                )
                if d % 3 == 2:  # jpeg: fixed-point roundtrip
                    rgb = jpeg_ycc_to_rgb(*jpeg_rgb_to_ycc(*rgb))
                exp += bytes(rgb)
        assert md == _hl.md5(bytes(exp)).hexdigest(), f"doc {d} ({d % 3})"


def test_jpeg_fill_bytes_and_dimension_limit():
    """Review r18: T.81 B.1.1.2 permits 0xFF FILL bytes before any
    marker — the walk must skip them, not misparse; and over-65535
    dims refuse with the module's ValueError crash class, not a
    struct.error."""
    from alternating_least_squares_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    px = bytes(range(64))
    good = encode_jpeg(px, 8, 8, 1)
    # insert fill bytes before the DQT and the SOS markers
    i = good.index(b"\xff\xdb")
    j = good.index(b"\xff\xda")
    filled = (
        good[:i] + b"\xff" * 3 + good[i:j] + b"\xff" + good[j:]
    )
    assert decode_jpeg(filled) == decode_jpeg(good)
    # trailing fill bytes at EOF still refuse (truncated marker)
    with pytest.raises(ValueError):
        decode_jpeg(good[:i] + b"\xff\xff")
    with pytest.raises(ValueError, match="65535"):
        encode_jpeg(b"\x00" * 70000, 70000, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    w=hst.integers(1, 34),
    h=hst.integers(1, 34),
    ch=hst.sampled_from([1, 3]),
    pxseed=hst.integers(0, 10**9),
)
def test_jpeg_reconstruction_property(w, h, ch, pxseed):
    """Any dimensions (including non-multiple-of-8 partial MCUs), any
    pixel content, gray or 4:4:4: decode_jpeg(encode_jpeg(x)) equals
    the encoder's predicted reconstruction BIT-exactly — the
    decode == encode⁻¹ pin stated in full, with the drawn content
    driving arbitrary Huffman AC paths (runs, ZRL, EOB positions,
    magnitude categories) and DC prediction chains. Deterministic
    content derived from the drawn seed (the PNG property's
    discipline)."""
    from alternating_least_squares_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_reconstruction,
    )

    n = w * h * ch
    px = bytes((pxseed // (3 ** (i % 19)) + 7 * i) % 256 for i in range(n))
    assert decode_jpeg(encode_jpeg(px, w, h, ch)) == (
        w, h, ch, jpeg_reconstruction(px, w, h, ch)
    )
