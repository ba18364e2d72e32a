"""Multimodal column conventions + Arrow-batched processing stubs.

Convention (the brief's contract): media is an opaque ``binary``
column plus a typed metadata struct::

    blob:  binary                       -- the raw payload
    media: struct<mime: string,         -- e.g. image/png, audio/wav
                  width: int, height: int,
                  sample_rate: int, n_frames: int>

The driver testdata carries no binary columns, so :func:`attach_blob`
derives a deterministic payload (UTF-8 bytes of ``documents.text``)
to exercise the real plumbing end-to-end: schema, Arrow batch
transfer, ``mapInPandas`` signature, partition behavior.

The DECODE step is real for BMP (round 9): :func:`encode_bmp` /
:func:`decode_bmp` build and parse uncompressed 24-bit Windows BMPs
with stdlib ``struct`` only — a public format, no image libraries —
and :func:`attach_bmp_blob` + :func:`decode_bmp_features` run that
decode Arrow-batched end to end (the mm01 entry; md5-oracled pixels).
The AUDIO path is equally real (round 14): raw int16 PCM decodes with
``numpy.frombuffer`` (:func:`pcm_frame_features`, mm06) and the
RIFF/WAVE container round-trips through :func:`encode_wav` /
:func:`decode_wav` (chunk-walking, loud on malformed/unsupported —
mm07), both oracle-exact on planted deterministic waveforms.
The PNG common case is real too (round 15): :func:`encode_png` /
:func:`decode_png` build and parse 8-bit RGB/RGBA PNGs with
stdlib ``zlib`` + ``struct`` — CRC-verified chunk walk, all five
scanline filters — plus, since round 16, 8-bit PALETTE (color type
3) PNGs (PLTE chunk walk, bpp=1 unfilter, index expansion to RGB;
mm09) and, since round 17, Adam7 INTERLACED PNGs (seven
independently-filtered pass sub-images de-interlaced through the
same unfilter machinery; mm10). BASELINE JPEG is real since round 18
(:func:`encode_jpeg` / :func:`decode_jpeg` — marker walk, DQT/DHT/
SOF0/SOS parse, Huffman entropy decode, dequantize, IDCT, fixed-point
YCbCr→RGB per ITU-T T.81; mm12), which closed the LAST capability
gate: :func:`decode_image` now dispatches by container signature to a
real stdlib decoder for every supported format — the PIL gate is
gone. :func:`extract_media_features` keeps the byte-level features
plus clearly-faked decode stand-ins for pipeline-shape testing.
Swapping in a richer decoder changes ONLY the body of the
per-batch function — the Spark-side plumbing (schemas, batching,
partitioning) is what this module locks down and tests.

Scale notes: ``mapInPandas`` streams Arrow record batches through the
Python worker — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k rows),
not by partition size. The transform is narrow (no shuffle); at
100 TB the cost is the Python-side decode itself, which is why
everything that CAN stay JVM-side (byte length, hashes, filtering on
metadata) is exposed as native exprs too.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, md5 string, fake_mean_byte double, "
    "decoded_width int, decoded_height int"
)


def attach_blob(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payload + metadata struct from a text
    table (testdata has no real media; the bytes are real, the mime is
    honest about it)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        blob.alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("media"),
    )


def blob_length(blob: Column) -> Column:
    """JVM-side byte length — never ship bytes to Python for this."""
    return F.octet_length(blob)


def blob_md5(blob: Column) -> Column:
    """JVM-side content hash (exact-dup key for binary payloads)."""
    return F.md5(blob)


def extract_media_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real per-byte work happens in pandas (md5, mean byte value) —
    this is the shape a real decoder plugs into. ``decoded_width`` /
    ``decoded_height`` are DETERMINISTIC FAKES (derived from the md5)
    standing in for the absent image decoder; they are marked as such
    in the schema name and here.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            # NULL payloads (e.g. NULL document text upstream of
            # attach_blob) read as empty bytes instead of killing the
            # task inside hashlib — every other text path coalesces
            # NULL the same way
            blobs = pdf[blob_col].map(lambda b: b if b is not None else b"")
            # hash each payload ONCE; per-byte work dominates this path
            digests = blobs.map(lambda b: hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "md5": digests,
                    "fake_mean_byte": blobs.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    # FAKE decode stand-ins: deterministic from content.
                    "decoded_width": digests.map(
                        lambda h: int(h[:4], 16) % 1920
                    ).astype("int32"),
                    "decoded_height": digests.map(
                        lambda h: int(h[4:8], 16) % 1080
                    ).astype("int32"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, n_bytes long, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame_size: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling over opaque payloads: chunk each payload into
    fixed-size byte "frames" and keep every ``stride``-th one — the
    video-keyframe access pattern. Unlike :func:`extract_media_features`
    (1:1 rows) this is a 1:N **row-expanding** ``mapInPandas``: one
    input row yields zero or more frame rows, which is the plumbing a
    real frame decoder needs (Arrow handles the fan-out; output batch
    size is decoupled from input batch size).

    Payload = UTF-8 bytes of the text column (same deterministic
    stand-in as :func:`attach_blob`; testdata text is ASCII so byte
    offsets equal character offsets, which the DuckDB oracle relies
    on). Empty/NULL payloads produce no rows — a document with no
    decodable frames simply leaves the pipeline.
    """

    # Flush accumulated frame rows whenever they reach this many, so
    # output batch memory is bounded by MAX_OUT_ROWS, not by
    # (input batch rows × frames per payload).
    MAX_OUT_ROWS = 10_000

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        def flush(rows):
            ids, idxs, lens, digests = rows
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_bytes": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

        rows = ([], [], [], [])
        for pdf in it:
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8")
                n_frames = (len(data) + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    chunk = data[i * frame_size : (i + 1) * frame_size]
                    rows[0].append(doc_id)
                    rows[1].append(i)
                    rows[2].append(len(chunk))
                    rows[3].append(hashlib.md5(chunk).hexdigest())
                    # flush INSIDE the frame loop so the bound holds
                    # even for a single multi-GB payload, not just
                    # across documents
                    if len(rows[0]) >= MAX_OUT_ROWS:
                        yield flush(rows)
                        rows = ([], [], [], [])
        if rows[0]:
            yield flush(rows)

    return df.select(id_col, text_col).mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, n_bytes long, resized_bytes long, resized_md5 string"


def resize_stride(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int = 4,
) -> DataFrame:
    """"Resize" over opaque payloads: keep every ``stride``-th byte —
    the deterministic stand-in for image downsampling (a real resize
    swaps the stride slice for an interpolating decoder; the Spark
    plumbing — 1:1 ``mapInPandas``, Arrow batching, bounded memory —
    is what this proves, completing the decode / feature-extract /
    RESIZE / frame-sample checklist next to mm01/mm02).

    Emits ``(doc_id, n_bytes, resized_bytes, resized_md5)``; NULL and
    empty payloads produce no row (nothing to resize). The DuckDB
    oracle rebuilds the strided bytes with
    ``string_agg(substring(...), '' ORDER BY i)`` — two independent
    constructions of the same byte string, md5-compared.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, lens, rlens, digests = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8")
                if not data:
                    continue
                resized = data[::stride]
                ids.append(doc_id)
                lens.append(len(data))
                rlens.append(len(resized))
                digests.append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(lens, dtype="int64"),
                    "resized_bytes": pd.Series(rlens, dtype="int64"),
                    "resized_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, RESIZE_SCHEMA)


BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, pixel_md5 string"
)


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Serialize raw 24-bit pixel bytes (top-down row-major, 3 bytes
    per pixel) as an uncompressed Windows BMP (BITMAPINFOHEADER,
    BI_RGB) — the PUBLIC image format simple enough to build and parse
    with nothing but stdlib ``struct``. Rows are written bottom-up
    with each row padded to a 4-byte boundary, per the format."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    row = width * 3
    if len(pixels) != row * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {row * height} "
            f"for {width}x{height}x24bpp"
        )
    pad = (-row) % 4
    body = b"".join(
        pixels[r * row : (r + 1) * row] + b"\x00" * pad
        for r in reversed(range(height))
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    head = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + len(body), 0, 0,
        BMP_HEADER_BYTES,
    )
    return head + info + body


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """REAL image decode with zero third-party deps (VERDICT r8 #5 —
    replaces the PIL-gated stub on the mm01 path): parse an
    uncompressed 24-bit BMP and return ``(width, height, pixels)``
    with pixels re-ordered top-down and row padding stripped. Handles
    both bottom-up (height > 0, the canonical layout) and top-down
    (height < 0) files, honors the header's pixel-array offset, and
    fails loudly on anything that is not 24bpp BI_RGB."""
    if len(blob) < BMP_HEADER_BYTES:
        raise ValueError(f"truncated BMP: {len(blob)} bytes")
    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", blob, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    hsize, width, height, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if hsize < 40 or planes != 1:
        raise ValueError(f"unsupported DIB header (size {hsize})")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP is supported (bpp={bpp}, "
            f"compression={comp})"
        )
    # ADVICE r9: width is a SIGNED header field — a corrupt width ≤ 0
    # makes ``row`` negative, the truncation check below vacuously
    # true, and the return a silent (negative_width, h, b'') instead
    # of the fail-loud contract. Height 0 is equally malformed.
    if width <= 0 or height == 0:
        raise ValueError(
            f"malformed BMP dimensions: width={width}, height={height}"
        )
    top_down = height < 0
    h = abs(height)
    row = width * 3
    stride = (row + 3) & ~3
    if len(blob) < offset + stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = []
    for r in range(h):
        src = r if top_down else h - 1 - r
        start = offset + src * stride
        rows.append(blob[start : start + row])
    return width, h, b"".join(rows)


def _ascii_pixels(doc_id: int, text, n: int, what: str) -> bytes:
    """The shared text→pixel-buffer contract of the planted image
    formats: the doc's text truncated/right-padded with ``'x'`` to
    exactly ``n`` bytes, ASCII-enforced LOUDLY (the oracle restates
    pixels with char-based substring+rpad, which only equals byte
    arithmetic on ASCII — ADVICE r9)."""
    try:
        return (text or "")[:n].ljust(n, "x").encode("ascii")
    except UnicodeEncodeError as ex:
        raise ValueError(
            f"{what} requires ASCII text in the "
            f"consumed prefix (doc_id={doc_id}): {ex}; the "
            "oracle restates pixels with char-based "
            "substring+rpad, which only equals byte "
            "arithmetic on ASCII"
        ) from ex


def _attach_blob_1to1(
    docs: DataFrame,
    build,
    *,
    id_col: str = "doc_id",
    value_col: str | None = None,
    out_col: str = "blob",
) -> DataFrame:
    """Shared Arrow-batched 1:1 payload-planting scaffold (review
    r15: the BMP/WAV/PCM/PNG attach functions were four verbatim
    copies of this loop — a fix to the shared contract had to land
    in four places). ``build(doc_id, value)`` produces the payload
    bytes per row (``value`` is the ``value_col`` cell, the id
    itself by default); the blob then crosses an Arrow boundary
    before any decode, so encode and decode never share Python
    process state."""
    value_col = value_col or id_col

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            blobs = [
                build(int(d), v)
                for d, v in zip(pdf[id_col], pdf[value_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    out_col: pd.Series(blobs, dtype="object"),
                }
            )

    cols = [id_col] if value_col == id_col else [id_col, value_col]
    return docs.select(*cols).mapInPandas(
        batches, f"doc_id long, {out_col} binary"
    )



def attach_bmp_blob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Plant a real decodable image per document: a ``(id%4+2) ×
    (id%3+1)`` 24-bit BMP whose pixel bytes are the doc's text
    truncated/right-padded with ``'x'`` to exactly fill the frame
    (the ``_ascii_pixels`` contract — ASCII enforced loudly so a
    regenerated testdata file carrying non-ASCII text fails here
    instead of silently diverging from the oracle's char-based
    substring arithmetic; ADVICE r9). Arrow-batched 1:1
    ``mapInPandas`` via the shared ``_attach_blob_1to1`` scaffold."""

    def build(d: int, text) -> bytes:
        w, h = d % 4 + 2, d % 3 + 1
        px = _ascii_pixels(d, text, w * h * 3, "attach_bmp_blob")
        return encode_bmp(px, w, h)

    return _attach_blob_1to1(
        docs, build, id_col=id_col, value_col=text_col
    )


def decode_bmp_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode BMP payloads (``decode_bmp``) into real image features:
    container size, parsed dimensions, and the md5 of the decoded
    top-down pixel bytes — the stub-free decode stage of the media
    pipeline. Arrow-batched 1:1 ``mapInPandas``; a corrupt payload
    raises (fail loud, the b06 corrupt-records entry is the
    quarantine pattern for tolerating it)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, sizes, ws, hs, digests = [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob) if blob is not None else b""
                w, h, px = decode_bmp(data)
                ids.append(doc_id)
                sizes.append(len(data))
                ws.append(w)
                hs.append(h)
                digests.append(hashlib.md5(px).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, DECODE_SCHEMA)


def decode_image(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode an image payload by container signature — every format
    this engine ingests now has a REAL stdlib-only decoder, so the
    round-9..17 PIL gate is GONE (VERDICT r17 #3 closed the last
    class, baseline JPEG): BMP → :func:`decode_bmp`, PNG (8/16-bit
    RGB/RGBA, palette, Adam7) → :func:`decode_png`, baseline JFIF →
    :func:`decode_jpeg`. Returns the uniform ``(width, height,
    channels, pixel bytes)``; unknown signatures raise loudly rather
    than guess (the b06 quarantine pattern handles them upstream)."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        return decode_jpeg(blob)
    if blob[:2] == b"BM":
        w, h, px = decode_bmp(blob)
        return w, h, 3, px
    raise ValueError(
        "decode_image: unrecognized image signature "
        f"{blob[:8]!r} (supported: PNG, baseline JPEG, BMP)"
    )


RESIZE_NN_SCHEMA = (
    "doc_id long, src_width int, src_height int, width int, height int, "
    "resized_md5 string, resized_bmp_bytes long"
)


def resize_bmp_nearest(
    df: DataFrame,
    out_w: int = 2,
    out_h: int = 2,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """REAL image resize with zero third-party deps (completes the
    decode → feature → RESIZE → frame-sample media ladder with an
    actual pixel operation — mm04's ``resize_stride`` remains the
    byte-level stand-in for formats the container can't decode):
    parse the BMP (:func:`decode_bmp`), nearest-neighbor sample the
    pixel grid (``src_x = x·src_w DIV out_w``, ``src_y = y·src_h DIV
    out_h`` — the classic integer mapping, deterministic, no
    float), then RE-ENCODE through :func:`encode_bmp` so the output
    is a valid BMP container again (its size is emitted as proof the
    round trip ran). Emits the md5 of the resized top-down pixel
    bytes, which a SQL oracle can restate with substring arithmetic
    when the planted pixels are document text. Arrow-batched 1:1
    ``mapInPandas``; corrupt payloads raise (b06 is the quarantine
    pattern)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"bad target dimensions {out_w}x{out_h}")

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, sws, shs, digests, blens = [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob) if blob is not None else b""
                w, h, px = decode_bmp(data)
                out = []
                for y in range(out_h):
                    sy = y * h // out_h
                    for x in range(out_w):
                        sx = x * w // out_w
                        off = (sy * w + sx) * 3
                        out.append(px[off : off + 3])
                rpx = b"".join(out)
                bmp = encode_bmp(rpx, out_w, out_h)
                ids.append(doc_id)
                sws.append(w)
                shs.append(h)
                digests.append(hashlib.md5(rpx).hexdigest())
                blens.append(len(bmp))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "src_width": pd.Series(sws, dtype="int32"),
                    "src_height": pd.Series(shs, dtype="int32"),
                    "width": pd.Series([out_w] * len(ids), dtype="int32"),
                    "height": pd.Series([out_h] * len(ids), dtype="int32"),
                    "resized_md5": pd.Series(digests, dtype="object"),
                    "resized_bmp_bytes": pd.Series(blens, dtype="int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, RESIZE_NN_SCHEMA
    )


# --- audio: real int16-PCM decode plumbing (round 14) -----------------
#
# PCM is the one audio format decodable with zero third-party deps
# (numpy.frombuffer over raw little-endian int16 IS the decode a WAV
# data chunk needs), so — exactly like the BMP path above vs the
# then-PIL-gated PNG/JPEG stub — the audio rung of the media ladder gets a
# REAL decode stage, not a byte-level stand-in. Compressed codecs
# (mp3/flac/ogg) stay behind decode_image-style loud gates if ever
# needed; the Spark-side plumbing (binary column, Arrow batches,
# frame windowing, exact integer features) is what transfers.

PCM_FRAME = 16  # samples per analysis frame

PCM_FEATURES_SCHEMA = (
    "doc_id long, frame_idx long, energy long, peak long"
)


def pcm_samples(doc_id: int) -> list[int]:
    """The planted deterministic waveform: ``48 + (doc_id%3)*16``
    samples (3-5 whole frames — variable length, always frame-
    aligned), sample i = ``(doc_id*7919 + i*104729 +
    i*i*(doc_id//65536) + 12345) % 65536 - 32768`` — full int16
    range incl. negatives, restatable by a SQL oracle with
    generate_series arithmetic.

    The quadratic-in-``i`` term carries the HIGH bits of doc_id:
    without it the whole sequence collapsed to ``(7919*doc_id mod
    65536, doc_id mod 3)`` and repeated with period 196608 in
    doc_id, so two unrelated docs could plant byte-identical WAVs
    once the table grew past ~196k ids (breaking p05's by-
    construction dedup ground truth). With it, equal waveforms
    force doc_id ≡ doc_id' (mod 2^32): sample 0 recovers ``7919*d
    mod 65536`` and the first difference ``x_1 - x_0 ≡ 104729 +
    d//65536`` recovers ``d//65536 mod 65536`` — injective for all
    doc_id < 2^32, i.e. any realistic corpus."""
    n = 48 + (doc_id % 3) * 16
    hi = doc_id // 65536
    return [
        (doc_id * 7919 + i * 104729 + i * i * hi + 12345) % 65536
        - 32768
        for i in range(n)
    ]


def attach_pcm_blob(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Plant a real decodable audio payload per document: the
    :func:`pcm_samples` waveform packed as raw little-endian int16
    PCM (a WAV file's data chunk, minus the RIFF header).
    Arrow-batched 1:1 via the shared ``_attach_blob_1to1`` scaffold;
    the content crosses an Arrow boundary again before decoding, so
    encode and decode never share Python process state."""

    def build(d: int, _v) -> bytes:
        s = pcm_samples(d)
        return struct.pack(f"<{len(s)}h", *s)

    return _attach_blob_1to1(docs, build, id_col=id_col, out_col="pcm")


def pcm_frame_features(
    df: DataFrame,
    frame: int = PCM_FRAME,
    id_col: str = "doc_id",
    blob_col: str = "pcm",
) -> DataFrame:
    """REAL audio decode + frame analysis with zero third-party deps:
    ``numpy.frombuffer(dtype='<i2')`` parses the PCM byte stream (THE
    decode operation for WAV data), the sample vector splits into
    fixed ``frame``-sample windows, and each frame emits exact
    integer features — ``energy`` = Σ s² and ``peak`` = max|s| (both
    BIGINT-exact: 16 · 32768² < 2⁶³, so no float RMS drift and a SQL
    oracle can hash-match bit-for-bit; callers wanting RMS divide
    once at the end). Arrow-batched ``mapInPandas`` (1:N — one row
    per frame); odd byte counts or non-frame-aligned streams RAISE
    (fail loud; b06 is the quarantine pattern for tolerating
    corruption). Scale: the decode is embarrassingly parallel over
    docs, output rows are 4 longs — the heavy binary column never
    survives past this stage."""
    if frame <= 0:
        raise ValueError(f"frame must be positive (got {frame})")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, fidx, energy, peak = [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    # a NULL payload (left-join miss, failed ingest)
                    # must not silently vanish from the feature output
                    # — the BMP path raises on the same input, and b06
                    # quarantine is the only tolerance opt-in
                    raise ValueError(
                        f"NULL PCM payload for doc_id={doc_id}"
                    )
                data = bytes(blob)
                if len(data) % 2:
                    raise ValueError(
                        f"odd PCM byte count {len(data)} for "
                        f"doc_id={doc_id}: not an int16 stream"
                    )
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                if len(s) % frame:
                    raise ValueError(
                        f"PCM stream of {len(s)} samples is not "
                        f"frame-aligned to {frame} (doc_id={doc_id})"
                    )
                for k in range(len(s) // frame):
                    w = s[k * frame : (k + 1) * frame]
                    ids.append(int(doc_id))
                    fidx.append(k)
                    energy.append(int((w * w).sum()))
                    peak.append(int(np.abs(w).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "peak": pd.Series(peak, dtype="int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, PCM_FEATURES_SCHEMA
    )


# --- audio container: real RIFF/WAVE encode + decode (round 14) -------
#
# mm06 proved the raw-PCM decode; this closes the container: a real
# RIFF/WAVE file (the format sox/ffmpeg/python-wave produce for
# 16-bit mono) built and parsed with stdlib struct only — the audio
# analog of encode_bmp/decode_bmp. The decoder WALKS chunks (skipping
# unknown ones like LIST/INFO metadata real recorders emit) instead
# of assuming fmt/data at fixed offsets; malformed containers raise.

def encode_wav(pcm: bytes, sample_rate: int) -> bytes:
    """Wrap raw little-endian int16 mono PCM in a minimal canonical
    RIFF/WAVE container (PCM format 1, 16-bit, 1 channel)."""
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    if sample_rate > 0x7FFFFFFF:
        # the fmt byte-rate field (rate*2) must fit '<I'; overflowing
        # it would surface as struct.error, breaking the module's
        # ValueError-only crash-class contract (review r14)
        raise ValueError(f"sample rate {sample_rate} exceeds WAV range")
    if len(pcm) % 2:
        raise ValueError(f"odd PCM byte count {len(pcm)}")
    if len(pcm) > 0xFFFFFFFF - 36:
        # the data-chunk size and the RIFF body size (len(pcm)+36)
        # must both fit '<I'; overflowing would surface as
        # struct.error, breaking the module's ValueError-only
        # crash-class contract (ADVICE r14, same reason as the
        # sample-rate guard above)
        raise ValueError(
            f"PCM payload of {len(pcm)} bytes exceeds WAV range"
        )
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, bytes]:
    """Parse a RIFF/WAVE container to ``(sample_rate, pcm_bytes)`` —
    16-bit mono PCM only (the loud-gate discipline: anything else
    raises rather than mis-decodes). Chunks are WALKED: unknown
    chunks (LIST, INFO, fact, ...) are skipped by their declared
    size including the RIFF odd-size pad byte, so real-world files
    with metadata parse correctly; a truncated/malformed container
    raises."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    declared = struct.unpack("<I", blob[4:8])[0]
    if declared + 8 > len(blob):
        raise ValueError(
            f"truncated RIFF: declares {declared + 8} bytes, "
            f"have {len(blob)}"
        )
    # walk ONLY within the declared RIFF extent: trailing bytes past
    # it (cat'd files, padded downloads, appended forgeries) must not
    # be parsed as chunks — a crafted trailing data chunk would
    # otherwise silently REPLACE the real PCM (review r14)
    end = 8 + declared
    pos, fmt, data = 12, None, None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        payload = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if fmt is not None:
                raise ValueError("duplicate fmt chunk")
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size})")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data":
            if data is not None:
                raise ValueError("duplicate data chunk")
            data = payload
        pos += 8 + size + (size % 2)  # RIFF pads odd chunks
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"unsupported WAV: format={audio_format} "
            f"channels={channels} bits={bits} (16-bit mono PCM only)"
        )
    if rate <= 0:
        # a crafted/corrupt fmt chunk with rate 0 would otherwise
        # decode "successfully" and zero-divide in the first
        # duration computation downstream (found by the junk fuzz)
        raise ValueError(f"bad sample rate {rate} in fmt chunk")
    if len(data) % 2:
        raise ValueError(f"odd data chunk size {len(data)}")
    return rate, data


def attach_wav_blob(
    docs: DataFrame, id_col: str = "doc_id", seed_col: str | None = None
) -> DataFrame:
    """Plant a real WAV file per document: the :func:`pcm_samples`
    waveform at a seed-derived sample rate (``8000 · (1 + seed%3)``)
    through :func:`encode_wav`. Arrow-batched 1:1 via the shared
    ``_attach_blob_1to1`` scaffold. ``seed_col`` (default: the id
    column itself) drives the waveform — two rows sharing a seed get
    byte-identical WAVs, which is how p05 plants exact-dup twins."""

    def build(_d: int, seed) -> bytes:
        s = pcm_samples(int(seed))
        return encode_wav(
            struct.pack(f"<{len(s)}h", *s), 8000 * (1 + int(seed) % 3)
        )

    return _attach_blob_1to1(
        docs, build, id_col=id_col, value_col=seed_col, out_col="wav"
    )


WAV_FEATURES_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, "
    "duration_us long, energy long, peak long"
)


def wav_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "wav"
) -> DataFrame:
    """REAL container decode → audio profile: parse the RIFF/WAVE
    header (:func:`decode_wav`), decode the PCM payload, and emit the
    doc-level profile — sample rate, sample count, exact integer
    duration in µs (``n·10⁶ DIV rate`` — no float seconds), total
    energy Σs² and peak (exact BIGINTs). One row per doc; the binary
    column dies here."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, rates, ns, dur, energy, peak = [], [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    raise ValueError(
                        f"NULL WAV payload for doc_id={doc_id}"
                    )
                rate, pcm = decode_wav(bytes(blob))
                s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                ids.append(int(doc_id))
                rates.append(rate)
                ns.append(len(s))
                dur.append(len(s) * 1_000_000 // rate)
                energy.append(int((s * s).sum()) if len(s) else 0)
                peak.append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "duration_us": pd.Series(dur, dtype="int64"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "peak": pd.Series(peak, dtype="int64"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, WAV_FEATURES_SCHEMA
    )


# --- PNG: real stdlib decode for the common case (round 15) -----------
#
# VERDICT r14 #4: PNG is the one PIL-gated format closable with the
# stdlib alone — zlib (in the stdlib) is the whole compression layer,
# and the rest is chunk framing plus the five scanline filters, pure
# arithmetic. The pair below builds and parses the COMMON cases:
# 8/16-bit RGB/RGBA and 8-bit palette, interlaced (Adam7) or not,
# critical chunks IHDR/PLTE/IDAT/IEND (ancillary chunks skipped by
# the walk, CRCs verified). JPEG closed in round 18
# (encode_jpeg/decode_jpeg below) — the PIL gate is gone. Same
# discipline that took BMP
# (encode_bmp/decode_bmp, round 9) and WAV (encode_wav/decode_wav,
# round 14) real.

PNG_SIG = b"\x89PNG\r\n\x1a\n"

PNG_DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, pixel_md5 string"
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): the neighbor (left, up,
    up-left) closest to the linear estimate a + b − c, ties broken
    left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_predictor(
    ftype: int, i: int, bpp: int, raw: bytes, prev: bytes
) -> int:
    """Predictor byte for position ``i`` of a scanline under filter
    ``ftype``, given the RECONSTRUCTED current (``raw``, bytes before
    ``i`` already final) and previous scanlines — the shared half of
    filtering and unfiltering, so the two directions cannot drift."""
    a = raw[i - bpp] if i >= bpp else 0
    b = prev[i]
    c = prev[i - bpp] if i >= bpp else 0
    if ftype == 0:
        return 0
    if ftype == 1:
        return a
    if ftype == 2:
        return b
    if ftype == 3:
        return (a + b) // 2
    return _paeth(a, b, c)


# Adam7 pass grid (PNG spec §8.2): per pass, the (x origin, x step,
# y origin, y step) of the pixels that pass carries.
_ADAM7 = (
    (0, 8, 0, 8),
    (4, 8, 0, 8),
    (0, 4, 4, 8),
    (2, 4, 0, 4),
    (0, 2, 2, 4),
    (1, 2, 0, 2),
    (0, 1, 1, 2),
)


def _adam7_passes(width: int, height: int) -> list[tuple[int, int, int, int, int, int]]:
    """The NON-EMPTY Adam7 passes for a ``width``×``height`` image as
    ``(x0, dx, y0, dy, wp, hp)`` — pass sub-image dims via the spec's
    ceiling arithmetic. Empty passes (small images miss later-origin
    passes entirely) contribute no scanlines and NO filter bytes, the
    detail most hand-rolled de-interlacers get wrong."""
    out = []
    for x0, dx, y0, dy in _ADAM7:
        wp = (width - x0 + dx - 1) // dx if width > x0 else 0
        hp = (height - y0 + dy - 1) // dy if height > y0 else 0
        if wp > 0 and hp > 0:
            out.append((x0, dx, y0, dy, wp, hp))
    return out


def _filter_scanlines(
    rows: list[bytes], bpp: int, filters: list[int]
) -> bytearray:
    """Filter a contiguous scanline group (a whole non-interlaced
    image, or ONE Adam7 pass — each pass restarts with a zero prior
    row, spec §8.2) into ``(filter byte + filtered row)*`` form."""
    scan = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for raw, f in zip(rows, filters):
        scan.append(f)
        scan.extend(
            (raw[i] - _png_predictor(f, i, bpp, raw, prev)) & 0xFF
            for i in range(len(raw))
        )
        prev = raw
    return scan


def _unfilter_scanlines(
    scan: bytes, off: int, row: int, bpp: int, nrows: int
) -> bytearray:
    """Unfilter ``nrows`` scanlines of ``row`` bytes starting at byte
    ``off`` of the inflated stream (one scanline group: the whole
    image, or one Adam7 pass — prior row starts zero per group).
    Returns the concatenated reconstructed rows."""
    out = bytearray()
    prev = bytes(row)
    for r in range(nrows):
        base = off + r * (row + 1)
        f = scan[base]
        if f > 4:
            raise ValueError(f"bad scanline filter type {f}")
        frow = scan[base + 1 : base + 1 + row]
        raw = bytearray(row)
        for i in range(row):
            raw[i] = (frow[i] + _png_predictor(f, i, bpp, raw, prev)) & 0xFF
        out.extend(raw)
        prev = bytes(raw)
    return out


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    row_filters: list[int] | None = None,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Serialize raw 8-bit pixel bytes (top-down row-major) as a
    PNG — color type 2 (RGB, channels=3), 6 (RGBA, channels=4), or,
    with ``palette``, 3 (indexed: ``pixels`` are 1-byte PLTE indices
    and a PLTE chunk of RGB triples is written between IHDR and
    IDAT). ``row_filters`` picks the per-scanline filter type (0-4,
    default all 0); filters are genuinely APPLIED before compression
    (bpp = 1 in palette mode), so a decoder that mishandles any
    filter type produces wrong pixels, not just wrong bytes.

    With ``interlace=True`` the image is Adam7-interlaced (spec
    §8.2): pixels are regrouped into up to seven pass sub-images,
    each filtered INDEPENDENTLY (prior row restarts at zero per
    pass), concatenated in pass order into one zlib stream; empty
    passes emit nothing. ``row_filters`` then addresses the emitted
    interlaced scanlines in stream order (pass 1 rows first), and
    its required length is the total non-empty pass row count —
    mismatches raise with that expected count.

    ``depth=16`` writes 16-bit samples: ``pixels`` is the raw
    scanline byte buffer with BIG-ENDIAN 2-byte samples (the PNG wire
    order), so bpp = 2×channels and the five filters run bytewise at
    that offset exactly as the spec prescribes; composes with
    ``interlace``, refuses with ``palette`` (the spec allows color
    type 3 only at depths ≤ 8)."""
    import zlib

    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if width > 0xFFFFFFFF or height > 0xFFFFFFFF:
        # keep the ValueError-only crash class: '>I' in the IHDR pack
        # would raise struct.error past 2^32-1 (same guard encode_wav
        # grew for its '<I' sizes)
        raise ValueError(f"dimensions {width}x{height} exceed the PNG >I range")
    if depth not in (8, 16):
        raise ValueError(f"depth must be 8 or 16, got {depth}")
    plte = b""
    if palette is not None:
        if depth != 8:
            raise ValueError(
                "palette PNG is defined only at depths <= 8 (spec "
                "11.2.2); 16-bit palette is not a legal PNG"
            )
        if channels != 3:
            # palette mode forces color type 3 / bpp 1 — a caller
            # passing channels=4 alongside a palette would silently
            # get a structurally different PNG than asked for; keep
            # the argument validation loud (ADVICE r16)
            raise ValueError(
                f"channels={channels} conflicts with palette mode "
                "(indexed PNG is always 1 byte/pixel; omit channels)"
            )
        if not 1 <= len(palette) <= 256:
            raise ValueError(
                f"palette must hold 1-256 entries, got {len(palette)}"
            )
        for e in palette:
            if len(e) != 3 or not all(
                isinstance(c, int) and 0 <= c <= 255 for c in e
            ):
                raise ValueError(f"bad palette entry {e!r} (want 3x 0-255)")
        plte = bytes(c for e in palette for c in e)
        bpp, color = 1, 3
        if pixels and max(pixels) >= len(palette):
            raise ValueError(
                f"palette index {max(pixels)} out of range for a "
                f"{len(palette)}-entry palette"
            )
    else:
        if channels not in (3, 4):
            raise ValueError(
                f"channels must be 3 (RGB) or 4 (RGBA), got {channels}"
            )
        bpp, color = channels * (depth // 8), 2 if channels == 3 else 6
    row = width * bpp
    if len(pixels) != row * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {row * height} "
            f"for {width}x{height}x{bpp}"
        )
    if interlace:
        passes = _adam7_passes(width, height)
        n_rows = sum(hp for *_, hp in passes)
    else:
        n_rows = height
    filters = row_filters if row_filters is not None else [0] * n_rows
    if len(filters) != n_rows or not all(0 <= f <= 4 for f in filters):
        raise ValueError(
            f"bad row_filters {filters!r} (want {n_rows} entries 0-4"
            + (", the interlaced scanline count)" if interlace else ")")
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color, 0, 0, int(interlace)
    )
    if interlace:
        scan = bytearray()
        fi = 0
        for x0, dx, y0, dy, wp, hp in passes:
            rows = [
                bytes(
                    pixels[((y0 + r * dy) * width + x0 + c * dx) * bpp + k]
                    for c in range(wp)
                    for k in range(bpp)
                )
                for r in range(hp)
            ]
            scan += _filter_scanlines(rows, bpp, filters[fi : fi + hp])
            fi += hp
    else:
        scan = _filter_scanlines(
            [pixels[r * row : (r + 1) * row] for r in range(height)],
            bpp,
            filters,
        )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + (_png_chunk(b"PLTE", plte) if palette is not None else b"")
        + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG decode, stdlib only: returns ``(width, height,
    channels, pixels)`` with pixels top-down row-major, unfiltered —
    at depth 16 the buffer keeps the wire's BIG-ENDIAN 2-byte
    samples, so its length is ``w*h*channels*2``. Chunks are WALKED
    with CRC verification; ancillary chunks (tEXt, gAMA, ...) are
    skipped, unknown CRITICAL chunks raise. Supported: depth 8 or 16
    for color type 2 (RGB) and 6 (RGBA); depth 8 for color type 3
    (palette — scanlines are 1-byte PLTE indices, unfiltered at bpp=1
    then index-expanded through the PLTE's RGB triples; the return is
    the EXPANDED RGB buffer, channels=3, the PIL convert("RGB")
    contract; 16-bit palette is spec-illegal and refuses);
    compression 0, filter method 0, interlace 0 (sequential) or 1
    (Adam7 — each pass sub-image unfiltered independently, then
    scattered to final positions) — anything else raises ValueError
    (the loud-gate discipline). The five scanline filters
    (None/Sub/Up/Average/Paeth) are all implemented; zlib failures,
    size mismatches, a missing/malformed/duplicated/late PLTE, and
    out-of-range palette indices surface as ValueError, the module's
    single crash class."""
    import zlib

    if len(blob) < len(PNG_SIG) or blob[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    idat_done = False  # spec: IDAT chunks must be consecutive
    seen_end = False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        end = pos + 8 + length
        if length > 0x7FFFFFFF or end + 4 > len(blob):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = blob[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", blob, end)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("duplicate IHDR")
            ihdr = data
        elif ctype == b"PLTE":
            # spec: at most one PLTE, after IHDR, before the first IDAT
            if ihdr is None:
                raise ValueError("PLTE before IHDR")
            if plte is not None:
                raise ValueError("duplicate PLTE")
            if idat:
                raise ValueError("PLTE after IDAT")
            if not data or len(data) % 3 or len(data) > 768:
                raise ValueError(
                    f"malformed PLTE length {len(data)} "
                    "(want a positive multiple of 3, <= 768)"
                )
            plte = data
        elif ctype == b"IDAT":
            if ihdr is None:
                raise ValueError("IDAT before IHDR")
            if idat_done:
                raise ValueError("non-consecutive IDAT chunks")
            idat.extend(data)
        elif ctype == b"IEND":
            seen_end = True
            pos = end + 4
            break
        elif not ctype[0] & 0x20:
            # critical bit (uppercase first letter) on a chunk this
            # decoder doesn't know — mis-rendering is not an option
            raise ValueError(f"unsupported critical chunk {ctype!r}")
        if idat and ctype != b"IDAT":
            idat_done = True
        pos = end + 4
    if ihdr is None or not seen_end:
        raise ValueError("missing IHDR or IEND")
    if pos != len(blob):
        raise ValueError(
            f"{len(blob) - pos} trailing bytes after IEND"
        )
    if len(ihdr) != 13:
        raise ValueError(f"bad IHDR length {len(ihdr)}")
    width, height, depth, color, comp, fmeth, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width <= 0 or height <= 0 or width > 0x7FFFFFFF or height > 0x7FFFFFFF:
        raise ValueError(f"malformed PNG dimensions {width}x{height}")
    if (
        depth not in (8, 16)
        or color not in (2, 3, 6)
        or (depth == 16 and color == 3)  # spec 11.2.2: PLTE needs <= 8
        or comp
        or fmeth
        or interlace > 1
    ):
        raise ValueError(
            f"only 8/16-bit RGB/RGBA or 8-bit palette PNG (interlace "
            f"0 or Adam7) is supported (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG (color type 3) without a PLTE chunk")
    # bytes per pixel IN the scanlines: palette rows carry 1-byte
    # indices, expanded through the PLTE only after unfiltering;
    # 16-bit samples are 2 bytes each (big-endian on the wire — the
    # returned buffer keeps that order) and the filters run bytewise
    # at this bpp offset exactly as the spec prescribes
    bpp = {2: 3, 3: 1, 6: 4}[color] * (depth // 8 if color != 3 else 1)
    channels = {2: 3, 3: 3, 6: 4}[color]
    row = width * bpp
    passes = _adam7_passes(width, height) if interlace else []
    want = (
        sum((wp * bpp + 1) * hp for *_, wp, hp in passes)
        if interlace
        else (row + 1) * height
    )
    # the cap below is only as good as `want`, which the IHDR (i.e.
    # the attacker) controls: deflate's maximum expansion is 1032:1,
    # so a stream that CLAIMS more than len(idat)*1032 output cannot
    # be valid — refuse before inflating anything (review r16)
    if want > len(idat) * 1032 + 64:
        raise ValueError(
            f"IHDR claims {want} scanline bytes but IDAT holds "
            f"{len(idat)} compressed bytes (impossible expansion)"
        )
    try:
        # cap the inflate at the IHDR-implied size so a few-KB deflate
        # bomb cannot allocate past `want` before the mismatch raises
        dec = zlib.decompressobj()
        scan = dec.decompress(bytes(idat), want)
        if dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1):
            raise ValueError(f"IDAT decodes past {want} bytes")
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    if not dec.eof:
        # the capped decompressobj accepts a stream whose terminator
        # was chopped off (plain zlib.decompress raised on it) — keep
        # that corruption class loud (review r16)
        raise ValueError("truncated IDAT stream (missing terminator)")
    if dec.unused_data:
        # bytes INSIDE the IDAT chunks after the zlib terminator —
        # plain zlib.decompress tolerated these silently; the spec
        # says the stream fills the IDAT data exactly (ADVICE r16)
        raise ValueError(
            f"{len(dec.unused_data)} trailing bytes inside IDAT "
            "after the zlib stream terminator"
        )
    if len(scan) != want:
        raise ValueError(
            f"IDAT decodes to {len(scan)} bytes, want {want}"
        )
    if interlace:
        # Adam7: unfilter each pass sub-image independently (prior
        # row restarts at zero per pass, spec §8.2), then SCATTER its
        # pixels to their final (x0+c·dx, y0+r·dy) positions
        out = bytearray(row * height)
        off = 0
        for x0, dx, y0, dy, wp, hp in passes:
            prow = wp * bpp
            raw = _unfilter_scanlines(scan, off, prow, bpp, hp)
            off += (prow + 1) * hp
            for r in range(hp):
                for c in range(wp):
                    dst = ((y0 + r * dy) * width + x0 + c * dx) * bpp
                    src = (r * wp + c) * bpp
                    out[dst : dst + bpp] = raw[src : src + bpp]
    else:
        out = _unfilter_scanlines(scan, 0, row, bpp, height)
    if color == 3:
        n_colors = len(plte) // 3
        bad = max(out, default=0)
        if out and bad >= n_colors:
            raise ValueError(
                f"palette index {bad} out of range for a "
                f"{n_colors}-entry PLTE"
            )
        out = bytearray(
            c for idx in out for c in plte[idx * 3 : idx * 3 + 3]
        )
    return width, height, channels, bytes(out)


def attach_png_blob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Plant a real decodable PNG per document: ``(id%4+2) ×
    (id%3+1)`` with ``3 + id%2`` channels (RGB for even ids, RGBA for
    odd), pixel bytes from the shared ``_ascii_pixels`` contract, and
    per-scanline filter ``(id + row) % 5`` — so across the corpus
    every filter type 0-4 is exercised IN the planted bytes, and the
    oracle's pixel hash certifies the unfilter arithmetic, not just
    the chunk walk. Arrow-batched 1:1 via ``_attach_blob_1to1``."""

    def build(d: int, text) -> bytes:
        w, h, ch = d % 4 + 2, d % 3 + 1, 3 + d % 2
        px = _ascii_pixels(d, text, w * h * ch, "attach_png_blob")
        return encode_png(px, w, h, ch, [(d + r) % 5 for r in range(h)])

    return _attach_blob_1to1(
        docs, build, id_col=id_col, value_col=text_col
    )


def attach_palette_png_blob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Plant a real decodable PALETTE PNG (color type 3) per
    document: ``(id%5+2) × (id%3+1)`` with an ``id%4+2``-entry PLTE
    whose entry ``j`` is the gray triple ``(65+j, 65+j, 65+j)``
    ('A'+j three times), index bytes = the doc's ASCII pixel buffer
    (the shared ``_ascii_pixels`` contract) reduced mod the palette
    size, and per-scanline filter ``(id + row) % 5`` applied at
    bpp=1 — so the decoded-and-EXPANDED pixel md5 certifies PLTE
    parsing, index expansion, and the 1-byte-pixel unfilter
    arithmetic together, and stays restatable in SQL (each text char
    becomes ``chr(65 + ord(ch) % n_colors)`` repeated 3×). Arrow-
    batched 1:1 via ``_attach_blob_1to1``."""

    def build(d: int, text) -> bytes:
        w, h, p = d % 5 + 2, d % 3 + 1, d % 4 + 2
        src = _ascii_pixels(d, text, w * h, "attach_palette_png_blob")
        idx = bytes(b % p for b in src)
        palette = [(65 + j, 65 + j, 65 + j) for j in range(p)]
        return encode_png(
            idx, w, h,
            row_filters=[(d + r) % 5 for r in range(h)],
            palette=palette,
        )

    return _attach_blob_1to1(
        docs, build, id_col=id_col, value_col=text_col
    )


def attach_interlaced_png_blob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Plant a real Adam7-INTERLACED PNG per document: ``(id%9+2) ×
    (id%7+2)`` with ``3 + id%2`` channels (RGB even / RGBA odd ids),
    pixel bytes from the shared ``_ascii_pixels`` contract, and
    per-INTERLACED-scanline filter ``(id + i) % 5`` in pass stream
    order — across the corpus every filter type runs inside every
    pass geometry. Dims up to 10×8 make pass membership VARY: some
    docs populate all seven passes, the smallest miss pass 2 (x0=4)
    or pass 3 (y0=4) entirely, so the empty-pass arithmetic (zero
    scanlines, zero filter bytes) is exercised IN the planted corpus,
    not just in unit fixtures. Arrow-batched 1:1 via
    ``_attach_blob_1to1``."""

    def build(d: int, text) -> bytes:
        w, h, ch = d % 9 + 2, d % 7 + 2, 3 + d % 2
        px = _ascii_pixels(d, text, w * h * ch, "attach_interlaced_png_blob")
        n_rows = sum(hp for *_, hp in _adam7_passes(w, h))
        return encode_png(
            px, w, h, ch,
            row_filters=[(d + i) % 5 for i in range(n_rows)],
            interlace=True,
        )

    return _attach_blob_1to1(
        docs, build, id_col=id_col, value_col=text_col
    )


def attach_deep_png_blob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Plant a real 16-BIT-depth PNG per document: ``(id%4+2) ×
    (id%3+1)`` with ``3 + id%2`` channels at depth 16 — the scanline
    buffer is the doc's ASCII pixel contract at 2 bytes/sample (both
    bytes of every sample are planted text bytes, so the decoded
    buffer md5 stays restatable as a SQL string hash), per-scanline
    filter ``(id + i) % 5`` running bytewise at bpp = 2×channels (a
    decoder predicting at the 8-bit offset reconstructs garbage and
    hash-breaks), and every ``id % 5 == 0`` doc ALSO Adam7-interlaced
    — the depth × interlace composition is certified inside one hash.
    Arrow-batched 1:1 via ``_attach_blob_1to1``."""

    def build(d: int, text) -> bytes:
        w, h, ch = d % 4 + 2, d % 3 + 1, 3 + d % 2
        px = _ascii_pixels(d, text, w * h * ch * 2, "attach_deep_png_blob")
        inter = d % 5 == 0
        n_rows = sum(hp for *_, hp in _adam7_passes(w, h)) if inter else h
        return encode_png(
            px, w, h, ch,
            row_filters=[(d + i) % 5 for i in range(n_rows)],
            interlace=inter,
            depth=16,
        )

    return _attach_blob_1to1(
        docs, build, id_col=id_col, value_col=text_col
    )


def seeded_png_pixel(seed: int, i: int) -> int:
    """Pixel byte ``i`` of the p06 planted image for ``seed`` — the
    shared Python/SQL contract (the p05 waveform discipline). The
    first six bytes are the seed's low 48 bits VERBATIM, so two
    distinct seeds < 2^48 always plant DISTINCT blobs (the keep-one
    by-construction claim needs this: a formula-only variant admitted
    collisions at seed distance lcm(60, 256) = 3840 — inside even the
    sf0.01 corpus); the tail mixes the seed's high bits the way the
    p05 waveform does, so bytes stay non-periodic in the seed."""
    if i < 6:
        return (seed >> (8 * i)) & 255
    return (seed * 131 + i * 65537 + i * i * (seed // 65536) + 77) % 256


def attach_seeded_png_blob(
    docs: DataFrame, id_col: str = "doc_id", seed_col: str = "seed"
) -> DataFrame:
    """Plant a real RGB/RGBA PNG per row driven ONLY by ``seed_col``
    (not by doc text): dims ``(seed%4+2) × (seed%3+1)`` with
    ``3 + seed%2`` channels, pixels from :func:`seeded_png_pixel`,
    per-row filter ``(seed + row) % 5``. Rows sharing a seed plant
    byte-identical blobs — the exact-dup-twin construction the p06
    curation chain dedupes on. Arrow-batched 1:1."""

    def build(d: int, seed) -> bytes:
        s = int(seed)
        w, h, ch = s % 4 + 2, s % 3 + 1, 3 + s % 2
        n = w * h * ch
        pxb = bytes(seeded_png_pixel(s, i) for i in range(n))
        return encode_png(
            pxb, w, h, ch, [(s + r) % 5 for r in range(h)]
        )

    return _attach_blob_1to1(
        docs, build, id_col=id_col, value_col=seed_col
    )


def png_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode PNG payloads and reduce the pixel bytes to the exact
    integer stats the p06 quality gates run on — (width, height,
    channels, n_px, sum_px, min_px, max_px). Arrow-batched 1:1; the
    heavy blob dies here, seven narrow columns ride on; corrupt
    payloads raise (fail loud)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "channels",
                "n_px", "sum_px", "min_px", "max_px",
            )}
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob) if blob is not None else b""
                w, h, ch, px = decode_png(data)
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["n_px"].append(len(px))
                out["sum_px"].append(sum(px))
                out["min_px"].append(min(px))
                out["max_px"].append(max(px))
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "channels": pd.Series(out["channels"], dtype="int32"),
                "n_px": pd.Series(out["n_px"], dtype="int64"),
                "sum_px": pd.Series(out["sum_px"], dtype="int64"),
                "min_px": pd.Series(out["min_px"], dtype="int64"),
                "max_px": pd.Series(out["max_px"], dtype="int64"),
            })

    return df.select(id_col, blob_col).mapInPandas(
        batches,
        "doc_id long, width int, height int, channels int, "
        "n_px long, sum_px long, min_px long, max_px long",
    )


def _decode_features_1to1(
    df: DataFrame, decode_fn, id_col: str, blob_col: str
) -> DataFrame:
    """Shared Arrow-batched decode-to-features scaffold (review r18:
    the PNG/JPEG/dispatch feature functions were three verbatim
    copies of this loop — the attach-side lesson of
    ``_attach_blob_1to1`` applied to the decode side).
    ``decode_fn(bytes) -> (width, height, channels, pixels)``; NULL
    payloads read as empty bytes (the shared contract), corrupt
    payloads raise (fail loud)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, ws, hs, chs, digests = [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob) if blob is not None else b""
                w, h, ch, px = decode_fn(data)
                ids.append(int(doc_id))
                ws.append(w)
                hs.append(h)
                chs.append(ch)
                digests.append(hashlib.md5(px).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "pixel_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        batches, PNG_DECODE_SCHEMA
    )


def decode_png_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode PNG payloads (``decode_png``) into parsed dimensions,
    channel count, and the md5 of the decoded top-down pixel bytes —
    the heavy blob dies at this stage, five narrow columns ride on.
    Arrow-batched 1:1 ``mapInPandas``; corrupt payloads raise (fail
    loud; b06 is the quarantine pattern)."""

    return _decode_features_1to1(df, decode_png, id_col, blob_col)


# --------------------------------------------------------------------
# Baseline sequential JPEG (JFIF), stdlib + numpy only — the LAST
# capability gate (VERDICT r17 #3): marker walk, DQT/DHT/SOF0/SOS
# parse, Huffman entropy decode, dequantize, IDCT, YCbCr→RGB, per
# ITU-T T.81 (public spec; quant + Huffman tables from its Annex K).
# Grayscale and 4:4:4 color only; progressive/extended SOFs, chroma
# subsampling, 16-bit quant tables, restart intervals, and arithmetic
# coding all refuse loudly (the mm07-mm11 gate discipline).
#
# Exactness contract (the decode == encode⁻¹ oracle discipline): the
# loss in JPEG lives ENTIRELY in the encoder's quantize step, so the
# decoder must invert entropy coding + zigzag + dequantize + IDCT
# bit-exactly — tests pin decode(encode(x)) against the encoder's own
# predicted reconstruction (jpeg_reconstruction) on random images.
# The planted mm12 fixtures go further: 8×8-tile-constant images have
# only a DC coefficient (every AC quantizes to an exact 0), and the
# Annex K tables are pinned with the DC step replaced by 8, so
# DC = 8·(v−128) survives quantize→dequantize→IDCT exactly and the
# DuckDB oracle can restate the decoded pixels arithmetically.
# Color transforms are 16-bit FIXED-POINT integer (the libjpeg
# approach) with a positive-bias floor division both engines share —
# no float anywhere near a hash.

_JPEG_QT_LUMA = [
    8, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QT_CHROMA = [
    8, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# _JPEG_ZIGZAG[k] = row-major (natural) index of the k-th zigzag coeff
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K Huffman specs: (bits per code length 1..16, symbol values)
_JPEG_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

_JPEG_B24 = 1 << 24  # positive bias making every ledger dividend >= 0


def _jpeg_fdiv16(x: int) -> int:
    """16-bit fixed-point scale-down with round-half-up built into the
    +32768 the callers add: biased so the dividend is nonnegative —
    Python // (floor) and DuckDB // (truncate) agree there, the
    oracle-exactness rule every integer entry follows."""
    return (x + _JPEG_B24) // 65536 - 256


def jpeg_rgb_to_ycc(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF full-range BT.601 RGB→YCbCr in 16-bit fixed point (the
    libjpeg-style integer path; coefficients sum to exactly 65536 per
    row so full gray maps to full gray)."""
    y = _jpeg_fdiv16(19595 * r + 38470 * g + 7471 * b + 32768)
    cb = 128 + _jpeg_fdiv16(-11059 * r - 21709 * g + 32768 * b + 32768)
    cr = 128 + _jpeg_fdiv16(32768 * r - 27439 * g - 5329 * b + 32768)
    return (
        min(255, max(0, y)), min(255, max(0, cb)), min(255, max(0, cr)),
    )


def jpeg_ycc_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF full-range BT.601 YCbCr→RGB, same fixed-point discipline;
    the exact inverse the mm12 oracle restates in SQL."""
    r = y + _jpeg_fdiv16(91881 * (cr - 128) + 32768)
    g = y + _jpeg_fdiv16(-22554 * (cb - 128) - 46802 * (cr - 128) + 32768)
    b = y + _jpeg_fdiv16(116130 * (cb - 128) + 32768)
    return (
        min(255, max(0, r)), min(255, max(0, g)), min(255, max(0, b)),
    )


_JPEG_DCT_M = None


def _jpeg_dct_matrix():
    """Orthonormal 8-point DCT-II matrix — identical scaling to the
    T.81 FDCT/IDCT ((1/4)·C(u)C(v)·Σ). Lazy so the module keeps its
    import-light surface (numpy loads on first codec use)."""
    global _JPEG_DCT_M
    if _JPEG_DCT_M is None:
        import math

        import numpy as np

        _JPEG_DCT_M = np.array(
            [
                [
                    (math.sqrt(1 / 8) if u == 0 else 0.5)
                    * math.cos((2 * x + 1) * u * math.pi / 16)
                    for x in range(8)
                ]
                for u in range(8)
            ]
        )
    return _JPEG_DCT_M


def _jpeg_huff_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), canonical per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol; raises on over/under-subscribed
    specs so a malformed DHT fails at parse, not mid-scan."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("jpeg: oversubscribed DHT code table")
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("jpeg: DHT bits/vals mismatch")
    return out


class _JpegBitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (0xFF→0xFF00)
    and 1-padding on flush."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; any REAL marker inside the scan refuses loudly
    (restart intervals are gated, see decode_jpeg)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated after 0xFF in scan")
            nxt = self.data[self.pos]
            if nxt != 0x00:
                raise ValueError(
                    f"jpeg: unexpected marker 0xff{nxt:02x} inside scan"
                )
            self.pos += 1  # stuffed 0xFF data byte
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code in scan")


def _jpeg_mag_bits(v: int) -> tuple[int, int]:
    """(SSSS category, appended magnitude bits) per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _jpeg_extend(bits_: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: undo _jpeg_mag_bits."""
    if cat == 0:
        return 0
    if bits_ < (1 << (cat - 1)):
        return bits_ - (1 << cat) + 1
    return bits_


def _jpeg_fdct_quant(block, qt: list[int]) -> list[int]:
    """8x8 level-shifted float block -> 64 quantized coeffs in zigzag
    order; rounding is half-away-from-zero (np.round is banker's and
    would break the decode==encode⁻¹ pin)."""
    import numpy as np

    m = _jpeg_dct_matrix()
    f = m @ block @ m.T
    scaled = f / np.asarray(qt, dtype=np.float64).reshape(8, 8)
    coef = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(
        np.int64
    )
    flat = coef.reshape(64)
    return [int(flat[_JPEG_ZIGZAG[k]]) for k in range(64)]


def _jpeg_dequant_idct(zz: list[int], qt: list[int]):
    """64 zigzag coeffs -> 8x8 uint8 spatial block (dequantize, IDCT,
    +128 level shift, round half-up, clamp — the T.81 decoder path)."""
    import numpy as np

    f = np.zeros(64, dtype=np.float64)
    for k in range(64):
        f[_JPEG_ZIGZAG[k]] = zz[k] * qt[_JPEG_ZIGZAG[k]]
    m = _jpeg_dct_matrix()
    x = m.T @ f.reshape(8, 8) @ m
    x = np.floor(x + 0.5) + 128.0
    return np.clip(x, 0, 255).astype(np.uint8)


def _jpeg_planes(pixels: bytes, width: int, height: int, channels: int):
    """Planted pixels -> list of float64 YCbCr/luma planes (exact
    integer color transform first, vectorized) + per-component quant
    tables. Shared by encode_jpeg and jpeg_reconstruction so the
    reconstruction pin covers the real encoder path."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    if channels == 3:
        rgb = arr.astype(np.int64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = (
            19595 * r + 38470 * g + 7471 * b + 32768 + _JPEG_B24
        ) // 65536 - 256
        cb = 128 + (
            (-11059 * r - 21709 * g + 32768 * b + 32768 + _JPEG_B24)
            // 65536
            - 256
        )
        cr = 128 + (
            (32768 * r - 27439 * g - 5329 * b + 32768 + _JPEG_B24)
            // 65536
            - 256
        )
        planes = [
            np.clip(p, 0, 255).astype(np.float64) for p in (y, cb, cr)
        ]
        return planes, [_JPEG_QT_LUMA, _JPEG_QT_CHROMA, _JPEG_QT_CHROMA]
    return (
        [arr[..., 0].astype(np.float64)],
        [_JPEG_QT_LUMA],
    )


def _jpeg_ycc_planes_to_rgb(y, cb, cr) -> bytes:
    """Vectorized twin of :func:`jpeg_ycc_to_rgb` over int64 planes —
    the ONE copy of the fixed-point inverse both decode_jpeg and
    jpeg_reconstruction share, so the decode == encode⁻¹ pin cannot
    be broken by the two paths drifting (review r18)."""
    import numpy as np

    r = y + ((91881 * (cr - 128) + 32768 + _JPEG_B24) // 65536 - 256)
    g = y + (
        (-22554 * (cb - 128) - 46802 * (cr - 128) + 32768 + _JPEG_B24)
        // 65536
        - 256
    )
    b = y + ((116130 * (cb - 128) + 32768 + _JPEG_B24) // 65536 - 256)
    return np.stack(
        [np.clip(p, 0, 255).astype(np.uint8) for p in (r, g, b)], axis=-1
    ).tobytes()


def encode_jpeg(
    pixels: bytes, width: int, height: int, channels: int = 1
) -> bytes:
    """Baseline sequential JFIF encoder (twin of :func:`decode_jpeg`,
    the fixture source for mm12): SOI, APP0, DQT (pinned tables),
    SOF0, Annex K DHTs, SOS, Huffman-entropy scan with byte stuffing,
    EOI. ``channels`` 1 = grayscale, 3 = RGB in (converted to 4:4:4
    YCbCr via the fixed-point transform). Non-multiple-of-8 dims are
    edge-replicated to full MCUs, decoder-side cropped."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError(
            f"encode_jpeg: channels must be 1 or 3, got {channels}"
        )
    if width < 1 or height < 1:
        raise ValueError("encode_jpeg: empty image")
    if width > 65535 or height > 65535:
        # SOF0 carries dims as 16-bit fields; check here so the crash
        # class stays ValueError, not struct.error (review r18)
        raise ValueError(
            f"encode_jpeg: dimensions {width}x{height} exceed the "
            "format's 65535 limit"
        )
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"encode_jpeg: got {len(pixels)} bytes for "
            f"{width}x{height}x{channels}"
        )
    planes, qt_by_comp = _jpeg_planes(pixels, width, height, channels)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = [
        np.pad(
            p, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
        )
        - 128.0
        for p in planes
    ]

    ncomp = channels
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    qts = [_JPEG_QT_LUMA] + ([_JPEG_QT_CHROMA] if ncomp == 3 else [])
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(qt[_JPEG_ZIGZAG[k]] for k in range(64))
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    )
    for c in range(ncomp):
        out += struct.pack("BBB", c + 1, 0x11, 0 if c == 0 else 1)
    dhts = [(0x00, _JPEG_DC_LUMA), (0x10, _JPEG_AC_LUMA)]
    if ncomp == 3:
        dhts += [(0x01, _JPEG_DC_CHROMA), (0x11, _JPEG_AC_CHROMA)]
    for tc, (bits, vals) in dhts:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += struct.pack("BB", c + 1, 0x00 if c == 0 else 0x11)
    out += b"\x00\x3f\x00"

    dc_codes = [_jpeg_huff_codes(*_JPEG_DC_LUMA)]
    ac_codes = [_jpeg_huff_codes(*_JPEG_AC_LUMA)]
    if ncomp == 3:
        dcc = _jpeg_huff_codes(*_JPEG_DC_CHROMA)
        acc = _jpeg_huff_codes(*_JPEG_AC_CHROMA)
        dc_codes += [dcc, dcc]
        ac_codes += [acc, acc]

    w = _JpegBitWriter()
    pred = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for c in range(ncomp):
                zz = _jpeg_fdct_quant(
                    padded[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    qt_by_comp[c],
                )
                cat, mag = _jpeg_mag_bits(zz[0] - pred[c])
                pred[c] = zz[0]
                code, ln = dc_codes[c][cat]
                w.write(code, ln)
                w.write(mag, cat)
                run = 0
                for k in range(1, 64):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[c][0xF0]  # ZRL
                        w.write(code, ln)
                        run -= 16
                    cat, mag = _jpeg_mag_bits(zz[k])
                    code, ln = ac_codes[c][(run << 4) | cat]
                    w.write(code, ln)
                    w.write(mag, cat)
                    run = 0
                if run:
                    code, ln = ac_codes[c][0x00]  # EOB
                    w.write(code, ln)
    w.flush()
    out += w.buf
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_reconstruction(
    pixels: bytes, width: int, height: int, channels: int = 1
) -> bytes:
    """What ``decode_jpeg(encode_jpeg(pixels, ...))`` must return,
    computed WITHOUT entropy coding: quantize→dequantize→IDCT through
    the same pinned tables, then the fixed-point color inverse. The
    bit-exact pin for the decoder's entropy+IDCT inversion (property-
    tested on random images in tests/test_multimodal.py)."""
    import numpy as np

    planes, qt_by_comp = _jpeg_planes(pixels, width, height, channels)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    recon = []
    for p, qt in zip(planes, qt_by_comp):
        pp = (
            np.pad(
                p, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
            )
            - 128.0
        )
        outp = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        for by in range(bh):
            for bx in range(bw):
                zz = _jpeg_fdct_quant(
                    pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qt
                )
                outp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _jpeg_dequant_idct(zz, qt)
                )
        recon.append(outp[:height, :width])
    if channels == 1:
        return recon[0].tobytes()
    y, cb, cr = (p.astype(np.int64) for p in recon)
    return _jpeg_ycc_planes_to_rgb(y, cb, cr)


def decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """REAL baseline JPEG decode, stdlib + numpy only — closes the
    last ``decode_image`` capability gate (VERDICT r17 #3): full
    marker walk (CRC-less by format design, strict lengths), DQT/DHT/
    SOF0/SOS parse, Huffman entropy decode with DC prediction and
    EOB/ZRL runs, dequantize, IDCT, fixed-point YCbCr→RGB. Returns
    ``(width, height, channels, pixels)`` — grayscale bytes or
    interleaved RGB. Refuses loudly: progressive/extended SOFs,
    subsampled chroma, 16-bit quant tables, restart intervals (DRI),
    arithmetic coding, markers inside the scan, truncated segments,
    and trailing bytes after EOI (the IDAT strictness discipline,
    ADVICE r16)."""
    import numpy as np

    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI signature")
    pos = 2
    qts: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    while True:
        if pos + 2 > len(blob):
            raise ValueError("jpeg: truncated before SOS")
        if blob[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
        # marker code — skip them instead of misreading 0xFF as the
        # code and the real marker as a segment length (review r18)
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(blob):
            raise ValueError("jpeg: truncated fill bytes before marker")
        m = blob[pos + 1]
        pos += 2
        if m == 0xD8:
            raise ValueError("jpeg: unexpected second SOI")
        if m == 0xD9:
            raise ValueError("jpeg: EOI before SOS (no image data)")
        if 0xD0 <= m <= 0xD7 or m == 0x01:
            raise ValueError(
                f"jpeg: unexpected standalone marker 0xff{m:02x}"
            )
        if m == 0xDD:
            raise ValueError("jpeg: restart intervals (DRI) not supported")
        if m in (0xC8, 0xF7, 0xF8):
            raise ValueError(f"jpeg: unsupported marker 0xff{m:02x}")
        if m in (
            0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise ValueError(
                "jpeg: only baseline sequential (SOF0) supported, got "
                f"SOF marker 0xff{m:02x}"
            )
        if pos + 2 > len(blob):
            raise ValueError("jpeg: truncated marker segment")
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(blob):
            raise ValueError("jpeg: bad segment length")
        seg = blob[pos + 2 : pos + seglen]
        pos += seglen
        if m == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq != 0:
                    raise ValueError(
                        "jpeg: 16-bit quantization tables not supported"
                    )
                if s + 65 > len(seg):
                    raise ValueError("jpeg: truncated DQT")
                qt = [0] * 64
                for k in range(64):
                    qt[_JPEG_ZIGZAG[k]] = seg[s + 1 + k]
                if 0 in qt:
                    raise ValueError("jpeg: zero quantizer step in DQT")
                qts[tq] = qt
                s += 65
        elif m == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                if tc > 1:
                    raise ValueError(f"jpeg: bad DHT class {tc}")
                if s + 17 > len(seg):
                    raise ValueError("jpeg: truncated DHT")
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                if s + 17 + n > len(seg):
                    raise ValueError("jpeg: truncated DHT values")
                vals = list(seg[s + 17 : s + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = (
                    _jpeg_huff_decode_table(bits, vals)
                )
                s += 17 + n
        elif m == 0xC0:  # SOF0
            if sof is not None:
                raise ValueError("jpeg: duplicate SOF")
            if len(seg) < 6:
                raise ValueError("jpeg: truncated SOF0")
            prec, h, w_, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(
                    f"jpeg: only 8-bit precision supported, got {prec}"
                )
            if nc not in (1, 3):
                raise ValueError(
                    f"jpeg: {nc}-component images not supported"
                )
            if len(seg) != 6 + 3 * nc:
                raise ValueError("jpeg: bad SOF0 segment length")
            if h == 0 or w_ == 0:
                raise ValueError("jpeg: zero image dimension")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "jpeg: only 1x1 sampling (grayscale / 4:4:4) "
                        f"supported, got factor 0x{samp:02x}"
                    )
                comps.append((cid, tq))
            if len({cid for cid, _ in comps}) != nc:
                raise ValueError("jpeg: duplicate component id in SOF0")
            sof = (w_, h, comps)
        elif m == 0xDA:  # SOS
            if sof is None:
                raise ValueError("jpeg: SOS before SOF0")
            w_, h, comps = sof
            if not seg:
                raise ValueError("jpeg: empty SOS header")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError(
                    "jpeg: SOS component count differs from SOF0"
                )
            if len(seg) != 1 + 2 * ns + 3:
                raise ValueError("jpeg: bad SOS segment length")
            sel = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                td, ta = tabs >> 4, tabs & 0xF
                match = [x for x in comps if x[0] == cs]
                if not match:
                    raise ValueError(
                        f"jpeg: SOS selects unknown component {cs}"
                    )
                tq = match[0][1]
                if tq not in qts:
                    raise ValueError(
                        f"jpeg: missing quantization table {tq}"
                    )
                if td not in huff_dc or ta not in huff_ac:
                    raise ValueError(
                        "jpeg: missing Huffman table for scan"
                    )
                sel.append((qts[tq], huff_dc[td], huff_ac[ta]))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if ss != 0 or se != 63 or ahal != 0:
                raise ValueError(
                    "jpeg: non-baseline spectral selection in SOS"
                )
            bw, bh = (w_ + 7) // 8, (h + 7) // 8
            nc = len(comps)
            planes = [
                np.zeros((bh * 8, bw * 8), dtype=np.uint8)
                for _ in range(nc)
            ]
            rd = _JpegBitReader(blob, pos)
            pred = [0] * nc
            for by in range(bh):
                for bx in range(bw):
                    for c in range(nc):
                        qt, dct, act = sel[c]
                        cat = rd.huff(dct)
                        if cat > 11:
                            raise ValueError("jpeg: bad DC category")
                        pred[c] += _jpeg_extend(rd.bits(cat), cat)
                        zz = [0] * 64
                        zz[0] = pred[c]
                        k = 1
                        while k < 64:
                            rs = rd.huff(act)
                            r, s_ = rs >> 4, rs & 0xF
                            if s_ == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "jpeg: AC run past block end"
                                )
                            zz[k] = _jpeg_extend(rd.bits(s_), s_)
                            k += 1
                        planes[c][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = _jpeg_dequant_idct(zz, qt)
            pos = rd.pos  # byte-aligned: pad bits die with the last byte
            if pos + 2 > len(blob) or blob[pos : pos + 2] != b"\xff\xd9":
                raise ValueError("jpeg: missing EOI after scan")
            pos += 2
            if pos != len(blob):
                raise ValueError(
                    f"jpeg: {len(blob) - pos} trailing bytes after EOI"
                )
            if nc == 1:
                return w_, h, 1, planes[0][:h, :w_].tobytes()
            y, cb, cr = (
                p[:h, :w_].astype(np.int64) for p in planes
            )
            return w_, h, 3, _jpeg_ycc_planes_to_rgb(y, cb, cr)
        # else: APPn / COM / other length-bearing segments are skipped


def jpeg_tile_value(doc_id: int, tx: int, ty: int, channel: int) -> int:
    """Planted mm12 tile color — the shared Python/SQL contract (the
    p06/mm06 discipline). Grayscale (channel -1) stays in 32..126 and
    color channels in 16..100 so every DECODED byte is ASCII-safe for
    the oracle's chr()-built pixel string."""
    if channel < 0:
        return 32 + (doc_id * 7 + tx * 13 + ty * 29) % 95
    if channel == 0:
        return 16 + (doc_id * 7 + tx * 13 + ty * 29) % 85
    if channel == 1:
        return 16 + (doc_id * 11 + tx * 17 + ty * 23) % 85
    return 16 + (doc_id * 13 + tx * 19 + ty * 31) % 85


def attach_jpeg_blob(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Plant a real baseline JFIF per row: ``8·(id%2+1) × 8·(id%3+1)``
    — whole 8×8 tiles, each tile CONSTANT at :func:`jpeg_tile_value`
    (so every AC coefficient quantizes to exactly 0 and the DC path
    is lossless under the pinned DC step of 8 — the mm12 exactness
    construction); even ids grayscale, odd ids 4:4:4 color.
    Arrow-batched 1:1 via the shared ``_attach_blob_1to1`` scaffold."""

    def build(d: int, _v) -> bytes:
        w, h = 8 * (d % 2 + 1), 8 * (d % 3 + 1)
        ch = 1 if d % 2 == 0 else 3
        px = bytearray()
        for yy in range(h):
            for xx in range(w):
                tx, ty = xx // 8, yy // 8
                if ch == 1:
                    px.append(jpeg_tile_value(d, tx, ty, -1))
                else:
                    px += bytes(
                        jpeg_tile_value(d, tx, ty, c) for c in range(3)
                    )
        return encode_jpeg(bytes(px), w, h, ch)

    return _attach_blob_1to1(docs, build, id_col=id_col)


def decode_jpeg_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode JPEG payloads (``decode_jpeg``) into parsed dimensions,
    channel count, and the md5 of the decoded pixel bytes — the mm08
    shape: the heavy blob dies at this stage, five narrow columns
    ride on. Arrow-batched 1:1 ``mapInPandas``; corrupt payloads
    raise (fail loud)."""

    return _decode_features_1to1(df, decode_jpeg, id_col, blob_col)


def attach_mixed_media_blob(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The mm13 mixed-corpus fixture: one REAL container per row with
    the format chosen by ``id % 3`` — uncompressed BMP, filtered RGB
    PNG, or baseline 4:4:4 JPEG — all planted from the SAME
    :func:`jpeg_tile_value` RGB tile contract (8-multiple dims,
    tile-constant colors: lossless through BMP/PNG by format and
    through JPEG by the mm12 DC-exactness construction). This is the
    real shape of a scraped corpus: the decoder cannot assume a
    format per partition, only per payload. Arrow-batched 1:1."""

    def build(d: int, _v) -> bytes:
        w, h = 8 * (d % 2 + 1), 8 * ((d // 3) % 3 + 1)
        px = bytearray()
        for yy in range(h):
            for xx in range(w):
                tx, ty = xx // 8, yy // 8
                px += bytes(
                    jpeg_tile_value(d, tx, ty, c) for c in range(3)
                )
        px = bytes(px)
        if d % 3 == 0:
            return encode_bmp(px, w, h)
        if d % 3 == 1:
            return encode_png(px, w, h, 3, [(d + r) % 5 for r in range(h)])
        return encode_jpeg(px, w, h, 3)

    return _attach_blob_1to1(docs, build, id_col=id_col)


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Format-agnostic decode over a MIXED media column via
    :func:`decode_image`'s signature dispatch — the mm08 feature shape
    (dims, channels, decoded-pixel md5) for a corpus where every row
    may carry a different container. Arrow-batched 1:1; unknown
    signatures and corrupt payloads raise (fail loud)."""

    return _decode_features_1to1(df, decode_image, id_col, blob_col)
