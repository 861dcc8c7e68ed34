"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this
environment, so the *decode* step is stubbed (NotImplementedError or a
deterministic fake) — but everything Spark-side is real and tested:
binary-column schema, Arrow-batched ``mapInPandas`` signatures, batch
shapes, and partition behavior. Swapping the stub for PIL/librosa/ffmpeg
changes one function body, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query

METADATA_SCHEMA = (
    "doc_id long, byte_len int, header_hex string, modality string"
)
FEATURE_SCHEMA = "doc_id long, feature array<double>"
FEATURE_DIM = 8

_DECODERS_AVAILABLE = False  # flips when real media libs are installed
try:  # pragma: no cover - decode libs absent in this container
    import PIL.Image  # noqa: F401

    _DECODERS_AVAILABLE = True
except ImportError:
    pass


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: an opaque binary payload
    column plus modality tag. (Testdata has no media blobs, so the
    payload is the UTF-8 text — the pipeline treats it as opaque.)"""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text").alias("modality"),
    )


def decode_image(payload: bytes) -> object:
    """Real decode is environment-gated — STUB (clearly marked)."""
    if not _DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image decode requires PIL, not installed in this environment"
        )
    raise NotImplementedError("wire PIL.Image.open here when available")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize is decode-dependent — STUB, same gate as decode_image.
    The distributed shape (a bytes→bytes Pandas-UDF body) is what
    matters: swapping in PIL's thumbnail keeps the plan identical."""
    if not _DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image resize requires PIL, not installed in this environment"
        )
    raise NotImplementedError("wire PIL resize here when available")


# --- frame sampling -------------------------------------------------------
FRAME_BYTES = 16  # bytes per synthetic "frame"
FRAME_STRIDE = 4  # keep every 4th frame
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hex string"


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker with 1→N output shape: slice each payload
    into fixed-size frames and keep every FRAME_STRIDE-th — the video
    frame-sampling pattern (payload stands in for a decoded stream;
    a real codec changes this body, not the plan)."""
    for pdf in batches:
        doc_ids, idxs, frames = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            n_frames = len(raw) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                doc_ids.append(doc_id)
                idxs.append(i)
                frames.append(raw[i * FRAME_BYTES : (i + 1) * FRAME_BYTES].hex())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_hex": pd.Series(frames, dtype="object"),
            }
        )


def frame_sample_pipeline(docs: DataFrame) -> DataFrame:
    payloads = attach_binary_payload(docs)
    return payloads.mapInPandas(sample_frames, FRAME_SCHEMA)


def extract_metadata(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-payload typed metadata. Arrow-batched —
    each pdf is a columnar batch, never row-at-a-time Python."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "header_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                "modality": pdf["modality"],
            }
        )


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: fixed-dim feature vector per payload.
    Deterministic fake (byte-histogram folded to FEATURE_DIM) standing
    in for a real encoder; schema/batch shape are what a model server
    UDF would produce."""
    for pdf in batches:
        feats = []
        for b in pdf["payload"]:
            hist = [0.0] * FEATURE_DIM
            for i, byte in enumerate(bytes(b)):
                hist[byte % FEATURE_DIM] += 1.0
            total = sum(hist) or 1.0
            feats.append([v / total for v in hist])
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})


def metadata_pipeline(docs: DataFrame) -> DataFrame:
    payloads = attach_binary_payload(docs)
    return payloads.mapInPandas(extract_metadata, METADATA_SCHEMA)


def feature_pipeline(docs: DataFrame) -> DataFrame:
    payloads = attach_binary_payload(docs)
    return payloads.mapInPandas(extract_features, FEATURE_SCHEMA)


@query(
    "multimodal_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
           'text' AS modality
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary metadata extraction through the Arrow/pandas path —
    oracle-checked (byte lengths and header bytes are deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    return metadata_pipeline(docs)


def _feature_oracle() -> str:
    """Byte-histogram oracle: per-byte bucket = ascii % FEATURE_DIM
    (documents are ASCII, so codepoint == byte — same assumption the
    hash-matched frame_sample oracle makes). Each fk = exact int count
    divided in DOUBLE — IEEE-identical to the kernel's f64 division."""
    fks = ",\n           ".join(
        f"coalesce(CAST(sum(CASE WHEN bucket = {k} THEN 1 END) AS DOUBLE)"
        f" / count(bucket), 0.0) AS f{k}"
        for k in range(FEATURE_DIM)
    )
    return f"""
    WITH bytes AS (
      SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) % {FEATURE_DIM} AS bucket
      FROM (
        SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        FROM documents
      )
    )
    SELECT d.doc_id,
           {fks}
    FROM documents d LEFT JOIN bytes b USING (doc_id)
    GROUP BY d.doc_id
    """


@query("multimodal_features", _feature_oracle())
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-dim feature extraction through mapInPandas (the model-server
    UDF shape; deterministic byte-histogram stand-in for an encoder).
    The graded surface flattens the vector to one DOUBLE column per
    dimension — scalar columns canonicalize across engines, where a raw
    array column does not (r01 driver canonicalizer failure)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = feature_pipeline(docs)
    return feats.select(
        "doc_id",
        *[
            F.element_at("feature", k + 1).alias(f"f{k}")
            for k in range(FEATURE_DIM)
        ],
    )


@query(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           lower(hex(encode(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})))) AS frame_hex
    FROM (
      SELECT doc_id, text,
             unnest(range(0, octet_length(encode(text)) // {FRAME_BYTES},
                          {FRAME_STRIDE})) AS i
      FROM documents
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through mapInPandas (1→N batch shape) —
    oracle-checked against byte-slicing SQL (documents are ASCII, so
    char and byte offsets coincide on the oracle side)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_pipeline(docs)
