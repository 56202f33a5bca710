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


def bmp_media_from_documents(docs: DataFrame) -> DataFrame:
    """Image media table with REAL (synthesized) BMP payloads — the input
    the real-pixel resize path operates on. Dimensions and pixel values are
    pure functions of doc_id so both an oracle (dims/byte_len) and a pytest
    NumPy reference (pixels) can recompute them:

        w = doc_id % 24 + 8, h = doc_id % 16 + 8
        pixel[y, x, c] = (13*doc_id + 7*y + 3*x + c) % 256

    Synthesis runs worker-side in the same Arrow-batched mapInPandas shape
    as every other payload kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 24 + 8, did % 16 + 8
                y, x, c = np.ogrid[:h, :w, :3]
                payloads.append(
                    encode_bmp((13 * did + 7 * y + 3 * x + c) % 256)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        kernel, "media_id long, media_type string, payload binary"
    )


# --- pure-NumPy BMP codec (VERDICT r7 task #7) --------------------------------
#
# BMP (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up, rows padded to 4 bytes) is
# uncompressed, so decode/resize/re-encode needs no codec library — the resize
# kernel below does REAL pixel work on BMP payloads; only compressed formats
# (PNG/JPEG/...) remain gated behind PIL.

_BMP_HEADER_LEN = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def _bmp_row_stride(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def encode_bmp(arr) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP bytes."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp wants (h, w, 3) RGB")
    stride = _bmp_row_stride(w)
    size = _BMP_HEADER_LEN + stride * h
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + _BMP_HEADER_LEN.to_bytes(4, "little")  # pixel-data offset
        + (40).to_bytes(4, "little")             # BITMAPINFOHEADER
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")                # positive = bottom-up
        + (1).to_bytes(2, "little")              # planes
        + (24).to_bytes(2, "little")             # bpp
        + (0).to_bytes(4, "little")              # BI_RGB (uncompressed)
        + (stride * h).to_bytes(4, "little")
        + b"\x00" * 16                           # ppm + palette fields
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    return header + rows.tobytes()


def decode_bmp(data: bytes):
    """24-bit uncompressed bottom-up BMP bytes → (h, w, 3) uint8 RGB array.

    Compressed BMPs / other bit depths / other container formats raise
    NotImplementedError — those need a real codec (PIL), absent here.
    """
    import numpy as np

    data = bytes(data)
    if data[:2] != b"BM":
        raise NotImplementedError(
            "not a BMP payload — compressed formats (PNG/JPEG/...) need PIL, "
            "which is not installed in this container"
        )
    offset = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0 or h <= 0 or w <= 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed bottom-up BMP is codec-free "
            f"(got bpp={bpp}, compression={compression}, h={h}); "
            "other encodings need PIL"
        )
    stride = _bmp_row_stride(w)
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # bottom-up BGR → top-down RGB


def resize_max_dim(arr, max_dim: int):
    """Aspect-preserving nearest-neighbor downscale so max(h, w) <= max_dim.

    Output dims use integer math — ``max(1, old * max_dim // max(h, w))`` —
    so an oracle can compute them exactly. Nearest-neighbor source index is
    ``y_src = y_out * h // new_h`` (floor), the deterministic classic.
    """
    import numpy as np

    h, w = arr.shape[:2]
    if max(h, w) <= max_dim:
        return np.asarray(arr)
    new_w = max(1, w * max_dim // max(h, w))
    new_h = max(1, h * max_dim // max(h, w))
    ys = np.arange(new_h) * h // new_h
    xs = np.arange(new_w) * w // new_w
    return np.asarray(arr)[ys][:, xs]


def resize_images(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize image payloads worker-side via mapInPandas.

    BMP payloads (the codec-free uncompressed format) get REAL pixel work:
    decode → nearest-neighbor downscale to ``max_dim`` → re-encode, all
    NumPy. Compressed formats raise NotImplementedError from decode_bmp
    unless PIL is installed (it is not in this container) — the honesty
    gate now covers only genuinely codec-requiring inputs.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for pl in pdf["payload"]:
                raw = bytes(pl)
                if raw[:2] != b"BM" and HAVE_CODECS:  # pragma: no cover
                    raise NotImplementedError("real PIL decode goes here")
                arr = resize_max_dim(decode_bmp(raw), max_dim)
                payloads.append(encode_bmp(arr))
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        kernel, "media_id long, payload binary, width int, height int, byte_len long"
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


# --- pure-NumPy WAV/PCM codec (r9 — the audio analog of the BMP kernel) ------
#
# RIFF/WAVE with 16-bit PCM mono is uncompressed, so decode/feature-extract
# needs no codec library: the kernel below does REAL sample work on WAV
# payloads; compressed audio (MP3/OGG/...) stays honestly gated (needs a
# codec absent in this container).

_WAV_HEADER_LEN = 44  # RIFF(12) + fmt chunk(24) + data header(8)


def encode_wav(samples, sample_rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes (16-bit, 1 channel)."""
    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    return (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")        # fmt chunk size
        + (1).to_bytes(2, "little")         # PCM
        + (1).to_bytes(2, "little")         # mono
        + int(sample_rate).to_bytes(4, "little")
        + int(sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")         # block align
        + (16).to_bytes(2, "little")        # bits per sample
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


def decode_wav(data: bytes):
    """RIFF/WAVE PCM bytes → (int16 sample array, sample_rate).

    Non-PCM format tags (MP3/ADPCM/float), multi-channel, or non-16-bit
    payloads raise NotImplementedError — those need a real audio codec,
    absent here (the same honesty gate as compressed images)."""
    import numpy as np

    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a RIFF/WAVE payload — compressed audio needs a codec "
            "library, which is not installed in this container"
        )
    fmt_size = int.from_bytes(data[16:20], "little")
    fmt_tag = int.from_bytes(data[20:22], "little")
    channels = int.from_bytes(data[22:24], "little")
    rate = int.from_bytes(data[24:28], "little")
    bits = int.from_bytes(data[34:36], "little")
    if fmt_tag != 1 or channels != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit mono PCM WAV is codec-free (got fmt={fmt_tag}, "
            f"channels={channels}, bits={bits})"
        )
    # the fixed 44-byte layout holds only for a 16-byte fmt chunk followed
    # immediately by the data chunk; an 18-byte fmt (cbSize) or extra
    # LIST/fact chunks would shift every offset below — gate, don't
    # misparse (review r9: the gate checks above all sit BEFORE the shift,
    # so without this a shifted file decoded to silently wrong samples)
    if fmt_size != 16 or data[36:40] != b"data":
        raise NotImplementedError(
            "only the canonical 44-byte PCM WAV layout (16-byte fmt chunk, "
            "data chunk next) is codec-free; chunk-walking other layouts "
            "needs a real audio library"
        )
    n = int.from_bytes(data[40:44], "little") // 2
    return (
        np.frombuffer(data, dtype="<i2", count=n, offset=_WAV_HEADER_LEN),
        rate,
    )


def wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """Audio media table with REAL (synthesized) 16-bit PCM WAV payloads.
    Sample count, rate, and every sample value are pure functions of
    doc_id so a DuckDB oracle can recompute the features in closed form:

        n            = doc_id % 400 + 100
        sample_rate  = 8000 + (doc_id % 4) * 4000
        sample[i]    = (doc_id*31 + i*17) % 65536 − 32768
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, rates = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 400 + 100
                rate = 8000 + did % 4 * 4000
                i = np.arange(n, dtype=np.int64)
                payloads.append(
                    encode_wav((did * 31 + i * 17) % 65536 - 32768, rate)
                )
                rates.append(rate)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "audio",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        kernel, "media_id long, media_type string, payload binary"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over WAV payloads via mapInPandas:
    decode (RIFF parse + int16 frombuffer) → n_samples, sample_rate,
    duration_sec, rms, peak, zero crossings — the waveform stats an audio
    data pipeline gates on (silence/clipping filters). All NumPy; 6dp
    rounding on the float outputs per the oracle-parity convention."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                "media_id": [],
                "n_samples": [],
                "sample_rate": [],
                "duration_sec": [],
                "rms": [],
                "peak": [],
                "zero_crossings": [],
            }
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decode_wav(bytes(pl))
                v = s.astype(np.int64)
                rows["media_id"].append(int(mid))
                rows["n_samples"].append(len(v))
                rows["sample_rate"].append(rate)
                # half-away-from-zero 6dp (the F.round/DuckDB convention;
                # Python round() is half-even and can diverge on ties);
                # sign-preserving like the other kernels so a future
                # signed stat (DC offset, skew) can reuse it safely
                r6 = lambda x: float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6) + 0.0
                rows["duration_sec"].append(r6(len(v) / rate))
                rows["rms"].append(r6(float(np.sqrt(np.mean(v * v)))))
                rows["peak"].append(int(np.max(np.abs(v))) if len(v) else 0)
                rows["zero_crossings"].append(int(np.sum(v[:-1] * v[1:] < 0)))
            out = pd.DataFrame(rows)
            out["n_samples"] = out["n_samples"].astype("int64")
            out["sample_rate"] = out["sample_rate"].astype("int32")
            out["peak"] = out["peak"].astype("int64")
            out["zero_crossings"] = out["zero_crossings"].astype("int64")
            yield out

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        kernel,
        "media_id long, n_samples long, sample_rate int, duration_sec double, "
        "rms double, peak long, zero_crossings long",
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """REAL perceptual difference-hash over image payloads (r9-born — the
    image near-dup fingerprint, completing the modality set next to text
    simhash/minhash): decode BMP → integer grayscale (r+g+b)//3 →
    nearest-neighbor sample to a 9×8 grid (x_src = x·w//9, y_src =
    y·h//8, the resize_max_dim index convention) → one bit per adjacent
    horizontal pair (left > right) → 64-bit fingerprint (bit y·8+x).

    Near-identical images differ in O(1) bits, so banding the 64 bits
    exactly like dedup_simhash's pigeonhole scheme gives the scaled
    image near-dup join; this operator is the fingerprint stage. All
    integer math, so the DuckDB oracle recomputes every bit in closed
    form from the synthesis model — any drift in the decoder, the
    grayscale, or the sampling surfaces as a hash mismatch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_bmp(bytes(pl)).astype(np.int64)
                h, w = arr.shape[:2]
                gray = arr.sum(axis=2) // 3
                ys = np.arange(8) * h // 8
                xs = np.arange(9) * w // 9
                g = gray[np.ix_(ys, xs)]               # (8, 9)
                bits = (g[:, :8] > g[:, 1:]).astype(np.int64)  # (8, 8)
                idx = np.arange(8)
                val = int((bits << (idx[:, None] * 8 + idx[None, :])).sum())
                ids.append(int(mid))
                hashes.append(val)
            out = pd.DataFrame({"media_id": ids, "dhash": hashes})
            out["dhash"] = out["dhash"].astype("int64")
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(
        kernel, "media_id long, dhash long"
    )
