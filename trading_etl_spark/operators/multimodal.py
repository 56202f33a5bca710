"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (north-star extension — no reference analog).

Design for 100 TB of media:
- payloads are opaque bytes; all relational logic (filter, join, partition
  pruning) runs on the typed metadata columns so the scan never materializes
  payloads it doesn't need (Parquet column pruning does the heavy lifting);
- per-payload compute (decode / feature-extract / resize / frame-sample) runs
  as ``mapInPandas`` — Arrow-batched, one Python worker per partition, no
  driver involvement, output schema declared up front;
- the actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
  decode kernel is a clearly-marked deterministic fake behind
  ``try: import PIL`` — the Spark-side plumbing (schema, batch shape, UDF
  signature, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ["image", "audio", "video"]

META_FIELDS = (
    "media_id long, media_type string, byte_len long, "
    "width int, height int, sample_rate int"
)

try:  # codecs are absent in this container; keep the gate explicit
    from PIL import Image  # noqa: F401

    HAVE_CODECS = True
except ImportError:
    HAVE_CODECS = False


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a media table: payload = utf-8 bytes of
    the text (a deterministic opaque-binary stand-in), media_type cycled by
    doc_id. Schema matches schemas.MEDIA_SCHEMA minus the meta struct (which
    extract_media_meta computes)."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _fake_decode_meta(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """FAKE decode: deterministic (width, height, sample_rate) derived from
    the byte length. A real build replaces this with PIL / soundfile probes —
    the calling plumbing does not change."""
    n = len(payload)
    if media_type == "image":
        return (n % 640 + 1, n * 7 % 480 + 1, 0)
    if media_type == "audio":
        return (0, 0, 8000 + n % 8 * 1000)
    return (n % 640 + 1, n * 7 % 480 + 1, 8000 + n % 8 * 1000)  # video: both


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Decode/probe each payload into typed metadata via mapInPandas.

    Arrow streams the binary column worker-side in batches; each batch is
    probed vectorized-per-row and only the (small) metadata comes back —
    the payload never round-trips to the driver.
    """

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _fake_decode_meta(mt, pl)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "sample_rate": [m[2] for m in meta],
                }
            )
            yield out

    return media.mapInPandas(probe, META_FIELDS)


def resize_images(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize image payloads worker-side (real plumbing, stub kernel).

    Without codecs the "resize" is a deterministic truncation of the payload
    to ``max_dim²`` bytes — preserving the contract a real PIL kernel has:
    binary in, smaller binary out, same partitioning, schema declared.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_CODECS:  # pragma: no cover - codecs absent in container
                raise NotImplementedError("real PIL resize goes here")
            budget = max_dim * max_dim
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [bytes(p)[:budget] for p in pdf["payload"]],
                    "byte_len": [min(len(p), budget) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        kernel, "media_id long, payload binary, byte_len long"
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 256, frame_len: int = 16) -> DataFrame:
    """Frame-sample video payloads: one output row per sampled frame
    (1→N mapInPandas — the UDTF-shaped plumbing a real ffmpeg kernel needs).

    The stub emits ``frame_len``-byte slices every ``every_n_bytes`` as fake
    frames; frame_idx ordering and per-media fan-out are real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(pl)
                for i, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[off : off + frame_len])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("media_type") == "video").mapInPandas(
        kernel, "media_id long, frame_idx int, frame binary"
    )


# --- DuckDB oracle fragment ---------------------------------------------------

# mirrors media_from_documents + extract_media_meta's fake decode exactly
MEDIA_META_SQL = """
media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
         octet_length(encode(text))::BIGINT AS byte_len
  FROM documents
)
SELECT media_id, media_type, byte_len,
       CASE WHEN media_type IN ('image', 'video')
            THEN (byte_len % 640 + 1)::INT ELSE 0 END AS width,
       CASE WHEN media_type IN ('image', 'video')
            THEN (byte_len * 7 % 480 + 1)::INT ELSE 0 END AS height,
       CASE WHEN media_type IN ('audio', 'video')
            THEN (8000 + byte_len % 8 * 1000)::INT ELSE 0 END AS sample_rate
FROM media
""".strip()
