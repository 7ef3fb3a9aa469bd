"""Multimodal column primitives (brief family 4): media as opaque
``binary`` columns with typed metadata, decoded via Arrow-batched
python (``mapInPandas``) — the 100 TB pattern for image/audio/video
feature extraction where no JVM builtin exists.

The real decoders (PIL/librosa/av) are NOT in this container, so
``decode_image`` is a clearly-marked stub gated on import, and the
engine-side plumbing — schema contract, Arrow batch iteration, UDF
signature — runs against ``fake_decode_meta``, a deterministic fake
that derives metadata from the payload bytes. Every byte of the
plumbing (batching, schema, null handling) is therefore real and
oracle-testable; only the codec call is swapped.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

DECODE_SCHEMA = "doc_id long, width int, height int, mode string, n_bytes int, checksum int"


def decode_image(payload: bytes) -> dict:
    """Decode a real image payload. STUB: requires PIL, which this
    environment does not ship; callers get NotImplementedError with
    the swap-in instructions. The production path replaces exactly
    this function — the mapInPandas plumbing above it is unchanged."""
    try:
        from PIL import Image  # noqa: F401 — optional dependency
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires pillow; install it and decode_image "
            "becomes Image.open(io.BytesIO(payload)) — the surrounding "
            "mapInPandas batch plumbing (see decode_meta_batches) is "
            "codec-agnostic and already tested via fake_decode_meta"
        ) from exc
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return {"width": img.width, "height": img.height, "mode": img.mode}


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic fake decoder: metadata derived from payload bytes
    (first two bytes -> dimensions, third -> mode, plus byte stats).
    Exists so the Arrow plumbing is testable without codec libs; the
    DuckDB oracle reproduces the same arithmetic from the text twin."""
    b0 = payload[0] if len(payload) > 0 else 0
    b1 = payload[1] if len(payload) > 1 else 0
    b2 = payload[2] if len(payload) > 2 else 0
    return {
        "width": b0 % 64 + 1,
        "height": b1 % 64 + 1,
        "mode": "RGB" if b2 % 2 == 0 else "L",
        "n_bytes": len(payload),
        "checksum": sum(payload) % 997,
    }


def decode_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload: bytes) -> DECODE_SCHEMA rows.

    Arrow delivers each partition as a stream of pandas batches
    (spark.sql.execution.arrow.maxRecordsPerBatch rows each); the loop
    is per-batch vectorized-ish python — the codec call is the per-row
    part, exactly as a real image decode would be. Output must match
    DECODE_SCHEMA by name."""
    for pdf in batches:
        metas = [fake_decode_meta(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


FRAME_SCHEMA = "doc_id long, frame_id int, offset int, checksum int"
FRAME_BYTES = 64
MAX_FRAMES = 8


def sample_frames(payload: bytes) -> list[dict]:
    """Deterministic fake frame-sampler: the payload is treated as a
    video, one 'frame' per FRAME_BYTES window, capped at MAX_FRAMES
    (uniform head sampling). Real media swaps this for av/ffmpeg
    keyframe extraction; the 1->N row expansion shape is identical."""
    n_frames = min(len(payload) // FRAME_BYTES, MAX_FRAMES)
    out = []
    for k in range(n_frames):
        off = k * FRAME_BYTES
        out.append(
            {
                "frame_id": k,
                "offset": off,
                "checksum": payload[off] * 256 + payload[off + 1],
            }
        )
    return out


def sample_frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body with 1->N expansion: each (doc_id, payload)
    row yields up to MAX_FRAMES frame rows — the batch-shape contract
    for frame sampling / chunked feature extraction (output row count
    is decoupled from input row count, unlike a pandas_udf)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for fr in sample_frames(payload):
                fr["doc_id"] = doc_id
                rows.append(fr)
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_id", "offset", "checksum"]
        )


FEATURE_SCHEMA = "doc_id long, feature array<long>"
N_FEATURE_BUCKETS = 16


def extract_features(payload: bytes) -> list[int]:
    """Deterministic fake feature extractor: a 16-bucket byte histogram
    (bucket = byte % 16) — integer counts so the oracle comparison is
    exact, no float normalization drift. Real media swaps this for a
    model-forward pass (CLIP/wav2vec); the output contract — one
    fixed-length vector per payload, emitted as an array column that
    feeds the ANN/dedup embedding keys — is identical."""
    hist = [0] * N_FEATURE_BUCKETS
    for b in payload:
        hist[b % N_FEATURE_BUCKETS] += 1
    return hist


def extract_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, payload) -> (doc_id, feature) where
    feature is a fixed-length array<long> — the payload-to-vector
    contract for similarity search over media."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "feature": [extract_features(p) for p in pdf["payload"]],
            }
        )


RESIZE_SCHEMA = "doc_id long, n_bytes_in int, n_bytes_out int, out_md5 string"
RESIZE_STRIDE = 2


def resize_payload(payload: bytes) -> bytes:
    """Deterministic fake resize: keep every RESIZE_STRIDE-th byte —
    the stand-in for an image downscale that halves the payload. Real
    media swaps this for PIL.Image.resize; the binary-in/binary-out
    transform shape (and that the output is re-hashable, re-storable
    bytes) is what the plumbing proves."""
    return payload[::RESIZE_STRIDE]


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary-in/binary-out transform with integrity
    columns (in/out sizes + md5 of the output bytes) so the oracle can
    verify the produced bytes, not just their count."""
    import hashlib

    for pdf in batches:
        outs = [resize_payload(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes_in": [len(p) for p in pdf["payload"]],
                "n_bytes_out": [len(o) for o in outs],
                "out_md5": [hashlib.md5(o).hexdigest() for o in outs],
            }
        )
