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

The DECODE step is a stub by design — the image/audio libraries are
not in this container. :func:`extract_media_features` computes real
byte-level features (length, md5) plus clearly-faked decode outputs;
:func:`decode_image` raises ``NotImplementedError`` unless PIL is
importable. Swapping in a real decoder changes ONLY the body of the
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


def decode_image(blob: bytes):  # pragma: no cover - stub by design
    """Decode a real image payload. STUB: the container has no image
    libraries; gate on PIL and fail loudly rather than fake silently."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL/pillow, which is not installed in "
            "this environment; extract_media_features provides the "
            "deterministic-fake path for pipeline testing"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(blob))
