"""Multimodal / nested-column query keys (brief family 4; VERDICT r1
#10 — nothing existed in round 1).

The documents table stands in for a media corpus: ``payload`` is the
opaque binary column (utf-8 bytes of the text — at production it's
image/audio bytes; the engine treats it opaquely either way) with a
typed metadata struct alongside. Three surfaces:

* mm_pack_inline     — struct/array shaping: pack doc+embedding
                       records into array<struct>, inline back,
                       flatten (oracle: plain join — agreement proves
                       the round-trip is lossless).
* mm_binary_stats    — per-source stats over the binary column (byte
                       lengths, distinct content hashes) without ever
                       decoding it: the scan never leaves the JVM.
* mm_decode_meta     — the python path: mapInPandas + Arrow batches
                       running the (stubbed) decoder; the DuckDB
                       oracle reproduces the fake decode arithmetic
                       from the text twin, so the whole Arrow
                       round-trip is hash-verified, not smoke-tested.
* mm_frame_sample    — 1->N frame expansion, bounded per doc.
* mm_feature_extract — payload -> fixed-length array<long> vector
                       (the media-embedding contract for ANN/dedup).
* mm_resize          — binary-in/binary-out transform; output BYTES
                       md5-verified by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.multimodal import DECODE_SCHEMA, decode_meta_batches
from ..sources.readers import load_table

from ._base import make_registry

QUERIES, ORACLE, q = make_registry()


def with_payload(docs: DataFrame) -> DataFrame:
    """documents + opaque binary payload + typed metadata struct —
    the multimodal table shape (binary column, metadata alongside)."""
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


@q(
    "mm_pack_inline",
    """SELECT d.doc_id, d.lang, d.n_chars, e.label,
              CAST(len(e.embedding) AS INT) AS dim
       FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""",
)
def mm_pack_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round-trip: join documents x embeddings, pack each
    record into an array<struct>, F.inline it back out, flatten.
    Matching the flat-join oracle proves pack/inline is lossless.
    The embedding array itself stays a column (size() only) — arrays
    are first-class, never exploded row-wise unless asked."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d["doc_id"] == e["vec_id"]).select(
        "doc_id", "lang", "n_chars", "label", F.size("embedding").alias("dim")
    )
    packed = joined.select(
        F.array(
            F.struct("doc_id", "lang", "n_chars", "label", "dim")
        ).alias("records")
    )
    return packed.select(F.inline("records"))


@q(
    "mm_binary_stats",
    """SELECT source,
              COUNT(*) AS n_docs,
              CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
              CAST(MAX(octet_length(encode(text))) AS INT) AS max_bytes,
              COUNT(DISTINCT md5(text)) AS distinct_payloads
       FROM documents GROUP BY source""",
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary analytics: byte-length + content-hash stats per
    source WITHOUT decoding — pure JVM expressions over the binary
    column, which is how a 100 TB media table is profiled (the bytes
    never cross into python)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).cast("int").alias("max_bytes"),
        F.countDistinct(F.md5("payload")).alias("distinct_payloads"),
    )


@q(
    "mm_decode_meta",
    """SELECT doc_id,
              ascii(substr(text, 1, 1)) % 64 + 1 AS width,
              ascii(substr(text, 2, 1)) % 64 + 1 AS height,
              CASE WHEN ascii(substr(text, 3, 1)) % 2 = 0 THEN 'RGB' ELSE 'L' END AS mode,
              CAST(octet_length(encode(text)) AS INT) AS n_bytes,
              CAST(list_sum(list_transform(string_split(text, ''), x -> ascii(x))) % 997 AS INT) AS checksum
       FROM documents""",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The python decode path: binary payloads stream to python as
    Arrow batches, the (stub) decoder runs per row inside
    mapInPandas, typed metadata comes back. The oracle recomputes the
    fake-decoder arithmetic from the text twin, so the whole
    Arrow/pandas round-trip — batch iteration, schema contract, byte
    fidelity — is value-hash-verified.

    Scale: narrow map (no shuffle); python cost scales with executor
    python workers; swap fake_decode_meta -> decode_image for real
    media (functions/multimodal.py)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        decode_meta_batches, schema=DECODE_SCHEMA
    )


@q(
    "mm_frame_sample",
    """SELECT doc_id,
              CAST(k AS INT) AS frame_id,
              CAST(k * 64 AS INT) AS offset,
              ascii(substr(text, CAST(k * 64 + 1 AS INT), 1)) * 256
                + ascii(substr(text, CAST(k * 64 + 2 AS INT), 1)) AS checksum
       FROM documents,
            LATERAL unnest(range(0, least(octet_length(encode(text)) // 64, 8))) AS t(k)""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' payloads: mapInPandas with 1->N row
    expansion — each binary payload yields up to 8 frame rows (64-byte
    windows standing in for keyframes). The oracle recomputes the
    window arithmetic from the text twin, verifying the expansion's
    row multiplicity, offsets, and byte fidelity through Arrow.

    Scale: narrow map, no shuffle; output size is bounded at
    MAX_FRAMES per doc regardless of payload size — the cap that
    keeps a 2-hour video from exploding the stage."""
    from ..functions.multimodal import FRAME_SCHEMA, sample_frame_batches

    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        sample_frame_batches, schema=FRAME_SCHEMA
    )


@q(
    "mm_feature_extract",
    """SELECT doc_id,
              CAST(i AS INT) AS bucket,
              CAST(len(list_filter(
                       list_transform(string_split(text, ''), x -> ascii(x) % 16),
                       v -> v = i)) AS BIGINT) AS n
       FROM documents, LATERAL unnest(range(0, 16)) AS t(i)""",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> feature-vector extraction through Arrow: mapInPandas
    runs the (stub) extractor per payload and emits a fixed-length
    array<long> — the media analogue of text embedding, and the input
    shape the ANN/dedup embedding keys consume. Integer byte histogram
    (not floats) so the oracle comparison is exact. The corpus is
    ASCII, so the oracle's per-char arithmetic equals the python
    side's per-byte arithmetic.

    The KEY's compare surface is the vector posexploded to scalar
    (doc_id, bucket, n) rows: an array output column is unhashable
    under the driver's pandas canonicalizer and would ERR the row
    (the embed_pca r3 failure class — this key was headed for the
    same ERR in its first driver check until the realigned local
    harness caught it). The array itself remains the kernel contract
    (FEATURE_SCHEMA) for downstream vector consumers.

    Scale: narrow map + generate, no shuffle; a real extractor (CLIP
    forward pass) swaps in at functions/multimodal.py:extract_features
    with the same batch contract."""
    from ..functions.multimodal import FEATURE_SCHEMA, extract_feature_batches

    docs = with_payload(load_table(spark, sf_dir, "documents"))
    vecs = docs.select("doc_id", "payload").mapInPandas(
        extract_feature_batches, schema=FEATURE_SCHEMA
    )
    return vecs.select(
        "doc_id", F.posexplode("feature").alias("bucket", "n")
    ).select("doc_id", F.col("bucket").cast("int").alias("bucket"), "n")


@q(
    "mm_resize",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS INT) AS n_bytes_in,
              CAST((octet_length(encode(text)) + 1) // 2 AS INT) AS n_bytes_out,
              md5(array_to_string(
                    list_transform(range(1, len(text) + 1, 2),
                                   i -> substr(text, CAST(i AS INT), 1)), '')) AS out_md5
       FROM documents""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in/binary-out media transform (the 'resize' slot):
    mapInPandas produces a downsampled payload (stride-2 byte keep —
    the stub for an image downscale) plus integrity columns; the
    oracle recomputes the output bytes from the text twin and matches
    their md5, so the produced BYTES — not just their count — are
    verified through the Arrow round-trip.

    Scale: narrow map; real codecs swap in at
    functions/multimodal.py:resize_payload unchanged."""
    from ..functions.multimodal import RESIZE_SCHEMA, resize_batches

    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )
