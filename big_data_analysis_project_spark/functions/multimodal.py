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
