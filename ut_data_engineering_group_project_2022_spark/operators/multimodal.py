"""Multimodal column handling for a training-data pipeline.

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the bytes
never round-trip through the JVM row format one cell at a time.

The actual codec step is STUBBED (`decode_media` raises
``NotImplementedError`` — no image/audio libraries exist in this
environment); `fake_decode` is the deterministic stand-in the tests and
queries use. Everything Spark-side — schema, batch shape, partitioning,
the UDF signatures — is real and oracle-checked: payloads are the UTF-8
bytes of `documents.text`, so DuckDB can recompute every derived value
from the text column.

Scale notes: binary payloads stay columnar (Arrow) across the Python
boundary; feature extraction is embarrassingly parallel (no shuffle);
frame sampling explodes rows inside the Python worker and returns an
iterator of batches, so one oversized input batch cannot OOM the worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 16  # one synthetic "frame" = 16 payload bytes

MEDIA_TYPES = ("image", "audio", "video")


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """documents -> media table: opaque binary `content` (UTF-8 bytes of
    the text — deterministic, so oracles can recompute it), a media_type
    assigned round-robin by doc_id, and a typed metadata struct of the
    kind a real ingest would carry (dimensions / sample rate / frames)."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            ((F.col("doc_id") % 64 + 1) * 16).cast("int").alias("width"),
            ((F.col("doc_id") % 48 + 1) * 16).cast("int").alias("height"),
            (F.col("doc_id") % 3 * 8000 + 8000).cast("int").alias("sample_rate"),
            (F.length("text") / FRAME_BYTES).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(content: bytes, media_type: str):
    """The real codec boundary. Image/audio/video decoding libraries are
    not available in this environment — a deployment plugs PIL/ffmpeg/
    torchaudio in here. Until then this is an explicit stub."""
    raise NotImplementedError(
        f"no codec available for media_type={media_type!r}; "
        "use fake_decode for deterministic tests"
    )


def fake_decode(content: bytes, media_type: str) -> dict:
    """Deterministic decode stand-in: derives pseudo-dimensions from the
    payload bytes only (no randomness, no external deps)."""
    digest = hashlib.md5(content).digest()
    return {
        "media_type": media_type,
        "pseudo_width": digest[0] + 1,
        "pseudo_height": digest[1] + 1,
        "pseudo_duration_ms": int.from_bytes(digest[2:4], "big"),
    }


def media_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas
    (Arrow-batched; bytes handled as Python `bytes` objects inside the
    worker). Output: byte length, md5 checksum, fake-decoded dims."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                fake_decode(c, t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(c) for c in pdf["content"]],
                    "checksum": [
                        hashlib.md5(c).hexdigest() for c in pdf["content"]
                    ],
                    "pseudo_width": [d["pseudo_width"] for d in decoded],
                    "pseudo_height": [d["pseudo_height"] for d in decoded],
                }
            )

    return media.mapInPandas(
        extract,
        schema=(
            "doc_id long, media_type string, byte_len int, checksum string, "
            "pseudo_width int, pseudo_height int"
        ),
    )


def resize_image(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' stage with the real pipeline shape: binary in, binary
    out, metadata updated. The transform itself is the deterministic
    fake (truncate-or-zero-pad to `target_bytes`) standing in for a
    PIL/opencv resample. Only image rows are touched; others pass
    through unchanged."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = []
            for c, t in zip(pdf["content"], pdf["media_type"]):
                if t == "image":
                    b = bytes(c)[:target_bytes]
                    out_content.append(b + b"\x00" * (target_bytes - len(b)))
                else:
                    out_content.append(bytes(c))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "content": out_content,
                    "content_hex": [c.hex() for c in out_content],
                }
            )

    return media.mapInPandas(
        resize,
        schema="doc_id long, media_type string, content binary, content_hex string",
    )


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling for video payloads: split the byte stream into
    FRAME_BYTES-sized frames, keep every `every`-th, one output row per
    kept frame (a flatMap done batch-wise inside the Python worker).
    Frames surface as lowercase hex so cross-engine comparison is
    string-typed."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, c, t in zip(
                pdf["doc_id"], pdf["content"], pdf["media_type"]
            ):
                if t != "video":
                    continue
                b = bytes(c)
                for i in range(0, len(b) // FRAME_BYTES, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(
                        b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES].hex()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hex": frames}
            )

    return media.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_hex string"
    )
