"""Multimodal (image/audio/video) column plumbing for the training-data
pipeline.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs in Arrow-batched ``mapInPandas`` — the same
execution shape as the PDF extractor (plans/pipeline.py), so the 100 TB
properties carry over: narrow map, fine-grained scan splits for oversized
payloads, per-batch memory bounded by ``arrow.maxRecordsPerBatch``.

Decoding is tiered. Formats stdlib can handle decode for REAL
(functions/mediacodec.py): BMP pixel decode with an 8×8 average-hash,
PNG/JPEG/GIF header dimensions, and WAV audio via ``wave``. Compressed
pixel formats (the PIL / libav tier, absent in this sandbox) fall back
to ``_decode_stub`` — a deterministic pseudo-decode, clearly marked,
swapped for full decoders via ``register_decoder``. The Spark-side
plumbing (schema, batching, UDF signature, partitioning) is identical
for every tier; the stub is also expressible in SQL, which gives the
rare chance to oracle-check a pandas-UDF path end-to-end against DuckDB
(queries.py multimodal_features — synthetic payloads carry no media
magic, so they stay on the stub path by construction).

Reference parity note: the reference DROPS images at the poppler level
(``-i`` flag, PDFToHtml.java:52 — issue #56); our engine instead carries
media as ordered spans (SURVEY.md §2.1 S4) and this module is where they
become features.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.sqlkit import BASE, PRIME

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("phash", LongType()),
        StructField("decoder", StringType()),
    ]
)


def polyhash_bytes(data: bytes) -> int:
    """The sqlkit rolling hash, byte-wise — identical to the SQL
    ``polyhash`` fragment for ASCII payloads.  Vectorized block-Horner
    (functions/sqlkit.py): multi-MB decode-fallback payloads hash at
    numpy speed with bit-identical values (r3 VERDICT hot-path fix)."""
    from ..functions.sqlkit import polyhash_bytes as _ph

    return _ph(data)


def _decode_stub(payload: bytes, media_ref: str, kind: str) -> dict:
    """STUB decoder — deterministic pseudo-decode (no image/audio libs in
    this sandbox). Real deployments call ``register_decoder('image',
    pil_decode)`` etc.; raising NotImplementedError here would be the
    honest production default, but the stub keeps the plumbing testable
    AND SQL-checkable."""
    href = polyhash_bytes(media_ref.encode("ascii", "replace"))
    return {
        "n_bytes": len(payload),
        "width": 64 + (href % 1856),
        "height": 64 + ((href * BASE + 7) % PRIME) % 1016,
        "phash": polyhash_bytes(payload),
        "decoder": f"stub:{kind}",
    }


def _default_decode(payload: bytes, media_ref: str, kind: str) -> dict:
    """Default decoder chain: REAL stdlib decode when the payload is a
    format that needs no external libs (BMP pixels + aHash; PNG/JPEG/GIF
    header dimensions; WAV via ``wave`` — functions/mediacodec.py),
    otherwise the deterministic stub. Strict magic sniffing keeps
    synthetic test payloads on the stub path, so the SQL oracle is
    unaffected."""
    from ..functions.mediacodec import sniff_decode

    real = sniff_decode(payload, media_ref, kind)
    if real is not None:
        return {"n_bytes": len(payload), **real}
    return _decode_stub(payload, media_ref, kind)


_DECODERS: dict[str, Callable[[bytes, str, str], dict]] = {}


def register_decoder(kind: str, fn: Callable[[bytes, str, str], dict]) -> None:
    """Swap in a full decoder (e.g. PIL) for a media kind."""
    _DECODERS[kind] = fn


def _decode_batches(
    batches: Iterator[pd.DataFrame], decoders: dict
) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in FEATURE_SCHEMA.fields]
    for b in batches:
        out = []
        for doc_id, ref, kind, payload in zip(
            b["doc_id"], b["media_ref"], b["media_kind"], b["payload"]
        ):
            fn = decoders.get(kind, _default_decode)
            payload = bytes(payload) if payload is not None else b""
            feat = fn(payload, str(ref), str(kind))
            out.append({"doc_id": doc_id, "media_ref": ref,
                        "media_kind": kind, **feat})
        yield pd.DataFrame(out, columns=cols)


def media_features(media: DataFrame) -> DataFrame:
    """(doc_id, media_ref, media_kind, payload:binary) → feature rows.

    Narrow Arrow-batched map — zero shuffle; heavy payloads rely on scan
    granularity exactly like the PDF lane (BENCH.md §4).

    The decoder registry is SNAPSHOTTED into the UDF closure here:
    executors re-import this module fresh, so a driver-side dict mutated
    after plan construction would never reach them (cloudpickle ships the
    captured copy with the task)."""
    decoders = dict(_DECODERS)
    return media.select(
        "doc_id", "media_ref", "media_kind", "payload"
    ).mapInPandas(
        lambda it: _decode_batches(it, decoders), schema=FEATURE_SCHEMA
    )


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Synthesize a media table from the documents table (deterministic):
    payload = utf-8 text bytes, ref derived from (source, doc_id)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img://"), "source", F.lit("/"),
                 F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("media_kind"),
        F.encode("text", "utf-8").alias("payload"),
    )


def multimodal_features(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query: stub-decode features over the synthesized
    media table. The pandas-UDF output is cross-checked against a pure
    SQL oracle (the stub is hash-arithmetic, so DuckDB can replay it)."""
    return media_features(media_from_documents(spark, sf_dir))


def multimodal_features_oracle() -> str:
    from ..functions import sqlkit as K
    from ..functions.sqlkit import DUCK

    href = K.polyhash("media_ref", DUCK)
    ph = K.polyhash("text", DUCK)
    return f"""
        with m as (
            select cast(doc_id as varchar) as doc_id,
                   concat('img://', source, '/', cast(doc_id as varchar))
                       as media_ref,
                   'image' as media_kind,
                   text,
                   cast(length(text) as bigint) as n_bytes
            from documents
        )
        select doc_id, media_ref, media_kind, n_bytes,
               cast(64 + ({href} % 1856) as int) as width,
               cast(64 + (({href} * {BASE} + 7) % {PRIME}) % 1016 as int)
                   as height,
               {ph} as phash,
               'stub:image' as decoder
        from m
    """


# ---------------------------------------------------------------------------
# resize (one-to-one) and frame sampling (one-to-many) plumbing
# ---------------------------------------------------------------------------

RESIZE_MAX_DIM = 512

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame], decoders: dict,
                    max_dim: int) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in RESIZE_SCHEMA.fields]
    for b in batches:
        out = []
        for doc_id, ref, kind, payload in zip(
            b["doc_id"], b["media_ref"], b["media_kind"], b["payload"]
        ):
            payload = bytes(payload) if payload is not None else b""
            feat = decoders.get(kind, _default_decode)(payload, str(ref), str(kind))
            w, h = int(feat["width"]), int(feat["height"])
            m = max(w, h)
            if m > max_dim:
                # exact integer downscale (SQL-replayable — no float scale)
                ow = max(1, (w * max_dim) // m)
                oh = max(1, (h * max_dim) // m)
            else:
                ow, oh = w, h
            # STUB: payload passes through; a real deployment registers a
            # pixel transform via register_decoder and re-encodes here
            out.append({"doc_id": doc_id, "media_ref": ref, "width": w,
                        "height": h, "out_width": ow, "out_height": oh,
                        "payload": payload})
        yield pd.DataFrame(out, columns=cols)


def image_resize(media: DataFrame, max_dim: int = RESIZE_MAX_DIM) -> DataFrame:
    """Bounded-resolution resize plan: (payload, dims) → (payload, target
    dims), aspect-preserving, longest side ≤ ``max_dim``. Same narrow
    Arrow-batched shape as media_features; the per-image pixel work is a
    registered decoder at deployment, a deterministic stub here."""
    decoders = dict(_DECODERS)
    return media.select(
        "doc_id", "media_ref", "media_kind", "payload"
    ).mapInPandas(
        lambda it: _resize_batches(it, decoders, max_dim),
        schema=RESIZE_SCHEMA,
    )


FRAME_INTERVAL_MS = 5_000
FRAME_MAX = 8

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("timestamp_ms", LongType()),
        StructField("frame_ref", StringType()),
        StructField("frame_hash", LongType()),
    ]
)


def _avi_frame_rows(doc_id, ref, payload, info,
                    interval_ms: int, max_frames: int) -> list[dict]:
    """REAL frame sampling for an AVI payload: pick the stream chunk
    nearest each sample timestamp and hash its DECODED pixels — MJPEG
    frames ('..dc' chunks that are baseline JPEGs) run through the
    from-scratch decoder in functions/jpegdec.py and aHash; frames the
    decoder cannot take (non-JPEG codecs) fall back to a content hash
    of the raw chunk bytes, still real per-frame evidence."""
    from ..functions.jpegdec import decode_jpeg_luma
    from ..functions.mediacodec import ahash64

    frames = info["frames"]
    upf = info["us_per_frame"] or 33_333  # degenerate header: assume 30fps
    duration_ms = ((info["total_frames"] or len(frames)) * upf) // 1000
    n = int(min(max_frames, 1 + duration_ms // interval_ms,
                len(frames)))
    rows = []
    for i in range(n):
        ts = i * interval_ms
        fi = min((ts * 1000) // upf, len(frames) - 1)
        off, sz = frames[fi]
        raw = payload[off:off + sz]
        decoded = decode_jpeg_luma(raw) if raw[:2] == b"\xff\xd8" else None
        if decoded is not None:
            _, _, luma = decoded
            fh = ahash64(luma)
        else:
            fh = polyhash_bytes(raw)
        rows.append({
            "doc_id": doc_id, "media_ref": ref, "frame_idx": i,
            "timestamp_ms": ts, "frame_ref": f"{ref}#f{int(fi)}",
            "frame_hash": fh,
        })
    return rows


def _frame_batches(batches: Iterator[pd.DataFrame],
                   interval_ms: int, max_frames: int) -> Iterator[pd.DataFrame]:
    from ..functions.containerdec import container_duration_ms, parse_avi

    cols = [f.name for f in FRAME_SCHEMA.fields]
    for b in batches:
        out = []
        for doc_id, ref, payload in zip(
            b["doc_id"], b["media_ref"], b["payload"]
        ):
            payload = bytes(payload) if payload is not None else b""
            # REAL pixels for AVI payloads: the movi list gives frame
            # byte ranges and MJPEG frames decode via jpegdec (magic-
            # gated — synthetic oracle payloads have no RIFF magic)
            if payload[:4] == b"RIFF":
                info = parse_avi(payload)
                if info and info["frames"]:
                    out.extend(_avi_frame_rows(
                        doc_id, ref, payload, info,
                        interval_ms, max_frames))
                    continue
            ph = polyhash_bytes(payload)
            # Real duration when the payload is an MP4/WebM whose header
            # we can walk (magic-gated); frame DECODE for those still
            # needs a registered decoder, but the sampling fan-out is
            # driven by the true container duration.
            duration_ms = container_duration_ms(payload)
            if duration_ms is None:
                # STUB duration (deterministic, SQL-replayable)
                duration_ms = 1_000 + (ph % 59_000)
            n = min(max_frames, 1 + duration_ms // interval_ms)
            for i in range(n):
                out.append({
                    "doc_id": doc_id, "media_ref": ref, "frame_idx": i,
                    "timestamp_ms": i * interval_ms,
                    "frame_ref": f"{ref}#f{i}",
                    "frame_hash": (ph * (i + 1) + i) % PRIME,
                })
        yield pd.DataFrame(out, columns=cols)


def video_frame_sample(media: DataFrame,
                       interval_ms: int = FRAME_INTERVAL_MS,
                       max_frames: int = FRAME_MAX) -> DataFrame:
    """Frame sampling: one input row → N frame rows (variable fan-out
    inside ``mapInPandas`` — the batch shape real frame extraction
    needs; output row count is NOT the input row count, which Spark
    permits because mapInPandas yields arbitrary batches). Durations are
    REAL for MP4/MOV (``moov/mvhd``) and WebM/MKV (EBML ``Segment→Info``)
    payloads via the stdlib header walk in ``functions/containerdec.py``;
    frame decode itself remains a deployment-registered transform, and
    non-container payloads fall back to a deterministic stub duration so
    the synthetic-payload fan-out stays SQL-replayable."""
    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        lambda it: _frame_batches(it, interval_ms, max_frames),
        schema=FRAME_SCHEMA,
    )


def multimodal_resize(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query: aspect-preserving integer resize dims over
    the synthesized media table (payload column dropped for the oracle
    hash — binary payloads are pass-through)."""
    return image_resize(media_from_documents(spark, sf_dir)).drop("payload")


def multimodal_resize_oracle() -> str:
    from ..functions import sqlkit as K
    from ..functions.sqlkit import DUCK

    href = K.polyhash("media_ref", DUCK)
    return f"""
        with m as (
            select cast(doc_id as varchar) as doc_id,
                   concat('img://', source, '/', cast(doc_id as varchar))
                       as media_ref
            from documents
        ), dims as (
            select doc_id, media_ref,
                   cast(64 + ({href} % 1856) as int) as width,
                   cast(64 + (({href} * {K.BASE} + 7) % {K.PRIME}) % 1016
                        as int) as height
            from m
        )
        select doc_id, media_ref, width, height,
               cast(case when greatest(width, height) > {RESIZE_MAX_DIM}
                    then greatest(1, (width * {RESIZE_MAX_DIM})
                                     // greatest(width, height))
                    else width end as int) as out_width,
               cast(case when greatest(width, height) > {RESIZE_MAX_DIM}
                    then greatest(1, (height * {RESIZE_MAX_DIM})
                                     // greatest(width, height))
                    else height end as int) as out_height
        from dims
    """


def multimodal_frames(spark, sf_dir: str) -> DataFrame:
    """Driver-contract query: deterministic frame fan-out (one-to-many
    pandas-UDF path cross-checked against a lateral generate_series)."""
    return video_frame_sample(media_from_documents(spark, sf_dir))


def multimodal_frames_oracle() -> str:
    from ..functions import sqlkit as K
    from ..functions.sqlkit import DUCK

    ph = K.polyhash("text", DUCK)
    return f"""
        with m as (
            select cast(doc_id as varchar) as doc_id,
                   concat('img://', source, '/', cast(doc_id as varchar))
                       as media_ref,
                   {ph} as ph
            from documents
        ), sized as (
            select doc_id, media_ref, ph,
                   least({FRAME_MAX},
                         1 + (1000 + (ph % 59000)) // {FRAME_INTERVAL_MS})
                       as n_frames
            from m
        )
        , exploded as (
            select doc_id, media_ref, ph,
                   unnest(range(0, n_frames)) as i
            from sized
        )
        select doc_id, media_ref,
               cast(i as int) as frame_idx,
               cast(i * {FRAME_INTERVAL_MS} as bigint) as timestamp_ms,
               concat(media_ref, '#f', cast(i as varchar)) as frame_ref,
               cast((ph * (i + 1) + i) % {K.PRIME} as bigint) as frame_hash
        from exploded
    """


# ---------------------------------------------------------------------------
# fingerprint near-dup: banded hamming join over media phash
# ---------------------------------------------------------------------------

PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_HAM_MAX = 3  # pigeonhole: ≤3 flipped bits over 4 bands ⇒ ≥1 band equal


def media_phash_neardup(spark, sf_dir: str) -> DataFrame:
    """Image near-dup pairs by fingerprint hamming distance: the phash
    column (aHash64 for real decoders, stub polyhash for synthetic
    payloads — either way a deterministic 64-bit-space fingerprint)
    splits into 4×16-bit bands; candidates come from a banded
    equi-join (recall-complete for hamming ≤ 3 by pigeonhole, the
    simhash idiom), then the exact ``bit_count(xor)`` verify.

    This is what makes the decode tier (mediacodec/jpegdec) a DEDUP
    input at 100 TB: O(n·bands) candidate generation over billions of
    images, never an all-pairs pass."""
    from ..functions import sqlkit as K
    from ..functions.sqlkit import SPARK

    # tracked persist (runtime.track_cache): the phash frame feeds all
    # 4 band branches; harnesses release between queries so repeated
    # invocations in a long-lived session don't accumulate cached blocks
    from ..runtime import track_cache

    f = track_cache(multimodal_features(spark, sf_dir).select(
        "media_ref", "phash"))
    bands = None
    for bi in range(PHASH_BANDS):
        # bitslice, not div/mod: real aHashes use bit 63, and a banded
        # join must extract true bit fields for negative values too
        key = K.bitslice("phash", PHASH_BAND_BITS * bi,
                         (1 << PHASH_BAND_BITS) - 1, SPARK)
        b = f.select(
            "media_ref", "phash",
            F.lit(bi).alias("band_idx"),
            F.expr(key).alias("band_key"),
        )
        bands = b if bands is None else bands.unionByName(b)
    ham = K.hamming("a_phash", "b_phash", SPARK)
    return (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_key"])
        .filter(F.col("a.media_ref") < F.col("b.media_ref"))
        .select(
            F.col("a.media_ref").alias("media_ref_a"),
            F.col("b.media_ref").alias("media_ref_b"),
            F.col("a.phash").alias("a_phash"),
            F.col("b.phash").alias("b_phash"),
        )
        .distinct()
        .withColumn("hamming", F.expr(ham).cast("int"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("media_ref_a", "media_ref_b", "hamming")
    )


def media_phash_neardup_oracle() -> str:
    from ..functions import sqlkit as K
    from ..functions.sqlkit import DUCK

    ph = K.polyhash("text", DUCK)
    band_rows = " union all ".join(
        f"select media_ref, phash, {bi} as band_idx,"
        f" {K.bitslice('phash', PHASH_BAND_BITS * bi, (1 << PHASH_BAND_BITS) - 1, DUCK)}"
        f" as band_key from f"
        for bi in range(PHASH_BANDS)
    )
    ham = K.hamming("a_phash", "b_phash", DUCK)
    return f"""
        with f as (
            select concat('img://', source, '/', cast(doc_id as varchar))
                       as media_ref,
                   {ph} as phash
            from documents
        ),
        bands as ({band_rows}),
        cand as (
            select distinct a.media_ref as media_ref_a,
                   b.media_ref as media_ref_b,
                   a.phash as a_phash, b.phash as b_phash
            from bands a join bands b
              on a.band_idx = b.band_idx and a.band_key = b.band_key
             and a.media_ref < b.media_ref
        )
        select media_ref_a, media_ref_b,
               cast({ham} as int) as hamming
        from cand
        where {ham} <= {PHASH_HAM_MAX}
    """
