"""Multimodal column operators (north-star).

Media (image/audio/video) is modeled the way a 100 TB lake stores it:
an opaque ``binary`` payload column plus a typed metadata struct, with
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so ``decode`` is a clearly
marked deterministic STUB (``_fake_decode``) — the Spark-side contract
(schema, batch iteration, partition preservation, binary handling
through Arrow) is real and tested; swapping the stub for PIL/ffmpeg
is a one-function change on a real cluster.

The synthetic payloads derive from documents.text (utf-8 bytes) with a
12-byte fake header, so metadata extraction is oracle-checkable in SQL
while the pandas path is covered by the rows-only check + unit tests.
"""

from __future__ import annotations

import numpy as np

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_batch_spark.catalog import fan_out, load
from parquet_batch_spark.functions.hashing import hash32, sql_hash32
from parquet_batch_spark.functions.text import sql_tokens, tokens_col

HEADER_LEN = 12
_MAGIC = "IMGX"


def _with_payload(d: DataFrame) -> DataFrame:
    """Attach a synthetic binary media payload + typed metadata struct.

    payload = ascii header "IMGX" + 8-char zero-padded doc_id, then the
    utf-8 document bytes. metadata = struct(format, n_bytes, source).
    """
    header = F.concat(F.lit(_MAGIC), F.lpad(F.col("doc_id").cast("string"), 8, "0"))
    payload = F.encode(F.concat(header, F.col("text")), "utf-8")
    meta = F.struct(
        F.lit("imgx").alias("format"),
        (F.octet_length("text") + HEADER_LEN).cast("bigint").alias("n_bytes"),
        F.col("source").alias("source"),
    )
    return d.select("doc_id", payload.alias("payload"), meta.alias("media_meta"))


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — pure JVM expressions
    (no decode): format tag, byte length, header-embedded id."""
    d = load(spark, sf_dir, "documents")
    p = _with_payload(d)
    return p.select(
        "doc_id",
        F.col("media_meta.format").alias("fmt"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.length("payload").cast("bigint").alias("payload_bytes"),
        F.decode(F.expr(f"substring(payload, 1, {len(_MAGIC)})"), "utf-8").alias("magic"),
        F.decode(F.expr(f"substring(payload, {len(_MAGIC) + 1}, 8)"), "utf-8")
        .cast("bigint")
        .alias("header_id"),
    ).orderBy("doc_id")


_MULTIMODAL_METADATA_SQL = f"""
SELECT doc_id,
    'imgx' AS fmt,
    CAST(strlen(text) + {HEADER_LEN} AS BIGINT) AS n_bytes,
    CAST(strlen(text) + {HEADER_LEN} AS BIGINT) AS payload_bytes,
    '{_MAGIC}' AS magic,
    doc_id AS header_id
FROM documents
ORDER BY doc_id
"""


# ------------------------------------------------------------- decode path

try:  # real codec, used automatically when the environment provides it
    from PIL import Image as _PIL_Image  # pragma: no cover - not in container
except ImportError:
    _PIL_Image = None


def _real_decode(payload: bytes) -> dict:
    """Real image decode via Pillow when installed (import-guarded —
    this container ships no codecs, so the guard keeps the module
    importable and the synthetic path fully functional)."""
    if _PIL_Image is None:
        raise NotImplementedError(
            "non-IMGX payload and no codec available: install Pillow to "
            "decode real image bytes"
        )
    import io

    img = _PIL_Image.open(io.BytesIO(payload))
    gray = img.convert("L")
    data = list(gray.getdata())
    return {
        "n_body_bytes": len(payload),
        "mean_byte": sum(data) / len(data) if data else 0.0,
        "width": img.width,
        "height": img.height,
    }


def _decode(payload: bytes) -> dict:
    """Dispatch: synthetic IMGX payloads use the deterministic stub
    (oracle-checkable); anything else goes to the real codec path."""
    payload = bytes(payload)
    if payload.startswith(_MAGIC.encode()):
        return _fake_decode(payload)
    return _real_decode(payload)


def _fake_decode(payload: bytes) -> dict:
    """STUB decode for the synthetic IMGX corpus: deterministic
    pseudo-features from raw bytes, so the full pipeline is
    oracle-checkable without codecs."""
    body = payload[HEADER_LEN:]
    n = len(body)
    mean_byte = sum(body) / n if n else 0.0
    # fake "resolution" derived from the header id — stands in for
    # width/height a real decoder would produce
    hid = int(payload[len(_MAGIC) : HEADER_LEN].decode())
    return {
        "n_body_bytes": n,
        "mean_byte": mean_byte,
        "width": 64 + hid % 32,
        "height": 64 + (hid // 32) % 32,
    }


_FEATURE_SCHEMA = (
    "doc_id long, n_body_bytes long, mean_byte double, width int, height int"
)


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas chunk holds many payloads; the stub
    decoder runs per row *inside* the batch loop (the real pattern for
    CPU codecs). Partitioning is preserved — no shuffle; at 100 TB
    this stage scales linearly with executors.
    """
    d = load(spark, sf_dir, "documents")
    p = _with_payload(d)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode(raw) for raw in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return p.mapInPandas(extract, schema=_FEATURE_SCHEMA).orderBy("doc_id")


_MULTIMODAL_DECODE_SQL = f"""
SELECT doc_id,
    CAST(strlen(text) AS BIGINT) AS n_body_bytes,
    CAST(list_sum(list_transform(range(1, length(text) + 1),
        i -> unicode(text[i]))) AS DOUBLE) / length(text) AS mean_byte,
    CAST(64 + doc_id % 32 AS INTEGER) AS width,
    CAST(64 + (doc_id // 32) % 32 AS INTEGER) AS height
FROM documents
ORDER BY doc_id
"""


RESIZE_TARGET = 256  # bytes in the "thumbnail"


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail plumbing: downsample each payload body to ≤256
    bytes by a deterministic stride (the nearest-neighbor shape a real
    image resize takes — stride sampling per axis), emitting the new
    size and sampled-byte mean. A real deployment swaps the stride
    kernel for PIL's ``Image.resize`` inside the same ``mapInPandas``
    stage (see ``_real_decode`` for the import-guard pattern); the
    Spark-side contract — Arrow batches in, fixed schema out, no
    shuffle — is identical. Oracle mirrors the stride arithmetic over
    the source text bytes."""
    d = load(spark, sf_dir, "documents")
    p = _with_payload(d)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_out, means = [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(raw)[HEADER_LEN:]
                stride = max(1, len(body) // RESIZE_TARGET)
                sampled = body[::stride][:RESIZE_TARGET]
                ids.append(doc_id)
                n_out.append(len(sampled))
                means.append(
                    float(np.mean(np.frombuffer(sampled, dtype=np.uint8)))
                    if sampled
                    else 0.0
                )
            yield pd.DataFrame(
                {"doc_id": ids, "resized_bytes": n_out, "sampled_mean": means}
            )

    return (
        p.mapInPandas(resize, schema="doc_id long, resized_bytes int, sampled_mean double")
        .orderBy("doc_id")
    )


# stride sampling positions: 1, 1+s, 1+2s, ... (1-based), ≤ 256 samples
_MULTIMODAL_RESIZE_SQL = f"""
SELECT doc_id,
    CAST(LEAST({RESIZE_TARGET},
        CAST(CEIL(CAST(blen AS DOUBLE) / stride) AS BIGINT)) AS INTEGER)
        AS resized_bytes,
    CAST(list_sum(list_transform(
            generate_series(0, LEAST({RESIZE_TARGET},
                CAST(CEIL(CAST(blen AS DOUBLE) / stride) AS BIGINT)) - 1),
            i -> unicode(text[1 + i * stride]))) AS DOUBLE)
        / LEAST({RESIZE_TARGET}, CAST(CEIL(CAST(blen AS DOUBLE) / stride) AS BIGINT))
        AS sampled_mean
FROM (
    SELECT doc_id, text, strlen(text) AS blen,
        GREATEST(1, strlen(text) // {RESIZE_TARGET}) AS stride
    FROM documents
)
ORDER BY doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: split each payload body into fixed
    64-byte 'frames', keep every 4th, emit (doc_id, frame_idx, bytes)
    — the video-keyframe access pattern, as one mapInPandas stage."""
    d = load(spark, sf_dir, "documents")
    p = _with_payload(d)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(raw)[HEADER_LEN:]
                for idx in range(0, (len(body) + 63) // 64, 4):
                    chunk = body[idx * 64 : idx * 64 + 64]
                    rows.append(
                        {"doc_id": doc_id, "frame_idx": idx, "frame_bytes": len(chunk)}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return (
        p.mapInPandas(sample, schema="doc_id long, frame_idx int, frame_bytes int")
        .orderBy("doc_id", "frame_idx")
    )


_MULTIMODAL_FRAME_SQL = """
SELECT doc_id,
    CAST((f - 1) * 4 AS INTEGER) AS frame_idx,
    CAST(LEAST(blen - (f - 1) * 4 * 64, 64) AS INTEGER) AS frame_bytes
FROM (
    SELECT doc_id, blen,
        unnest(generate_series(1, ((blen + 63) // 64 + 3) // 4)) AS f
    FROM (SELECT doc_id, strlen(text) AS blen FROM documents)
)
ORDER BY doc_id, frame_idx
"""


# ------------------------------------------------------------------
# multimodal_dedup_phash
# ------------------------------------------------------------------

PHASH_BANDS = 4
PHASH_MIN_BANDS = 2  # near-dup threshold: >= 2 of 4 segment bands agree
PHASH_HOT_CAP = 256  # drop band values hotter than this (boilerplate guard)


def multimodal_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-dup detection over the BINARY media
    payload: the decoded content (payload minus the container header)
    is cut into {PHASH_BANDS} equal byte segments, each segment is
    fingerprinted, and two media objects are near-duplicates when at
    least {PHASH_MIN_BANDS} segment fingerprints agree. Output is the
    per-object fingerprint summary (band checksum, partner count, best
    band agreement, near-dup flag) so every object is value-checked
    even in a dup-free corpus — the banding
    trick of SimHash applied to media bytes (a real deployment swaps
    the segment hash for a DCT pHash inside the same topology;
    cf. dedup.py's simhash bands over text).

    Byte-exact portability: segments are sliced on ``hex(payload)``
    (2 hex chars per byte) because byte-slicing must behave
    identically in both engines regardless of the payload's encoding;
    the fingerprint is the portable md5-derived hash32 of the hex
    slice.

    Scale: candidates come ONLY from the (band_idx, band_hash)
    equi-join — never an all-pairs comparison. Band values shared by
    more than {PHASH_HOT_CAP} objects (the all-black-frame /
    boilerplate-header case) are dropped as blocking keys (HAVING +
    semi-join), bounding every join bucket at C({PHASH_HOT_CAP},2)
    pairs at ANY corpus size — the same hot-key guard as
    dedup_fuzzy_levenshtein's anchor cap.
    """
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    p = _with_payload(d)
    content_hex = F.expr(f"substring(hex(payload), {HEADER_LEN * 2 + 1})")
    hex_len = F.length(content_hex)
    # even per-band hex width (2 hex chars per byte, ceil split)
    band_w = F.ceil(hex_len / F.lit(2 * PHASH_BANDS)).cast("int") * 2
    bands = p.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(PHASH_BANDS)),
                lambda i: F.substring(content_hex, (i - 1) * band_w + 1, band_w),
            )
        ).alias("band0", "seg"),
    ).select(
        "doc_id",
        (F.col("band0") + 1).alias("band_idx"),
        hash32(F.col("seg")).alias("band_hash"),
        # (doc, band) grain — {PHASH_BANDS} rows/doc vs the hex-decoded
        # payload it derives from; hot, both self-join sides and the
        # per-doc checksum all consume bands (5 payload decodes in one
        # plan before r13), so checkpoint once (guide §2.4)
    ).localCheckpoint(eager=False)
    hot = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > PHASH_HOT_CAP)
        .select("band_idx", "band_hash")
    )
    cold = bands.join(F.broadcast(hot), ["band_idx", "band_hash"], "left_anti")
    b2 = cold.select(
        F.col("band_idx").alias("band_idx2"),
        F.col("band_hash").alias("band_hash2"),
        F.col("doc_id").alias("doc_b"),
    )
    pairs = (
        cold.join(
            b2,
            (F.col("band_idx") == F.col("band_idx2"))
            & (F.col("band_hash") == F.col("band_hash2"))
            & (F.col("doc_id") != F.col("doc_b")),
        )
        .groupBy("doc_id", "doc_b")
        .agg(F.countDistinct("band_idx").alias("n_bands"))
    )
    partner = pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_partners"),
        F.max("n_bands").alias("best_shared"),
    )
    per_doc = bands.groupBy("doc_id").agg(
        F.sum("band_hash").alias("band_sum")
    )
    return (
        per_doc.join(partner, "doc_id", "left")
        .select(
            "doc_id",
            "band_sum",
            F.coalesce("n_partners", F.lit(0).cast("long")).alias("n_partners"),
            F.coalesce("best_shared", F.lit(0).cast("long")).alias("best_shared"),
            (F.coalesce("best_shared", F.lit(0)) >= PHASH_MIN_BANDS).alias(
                "is_near_dup"
            ),
        )
        .orderBy("doc_id")
    )


_PHASH_SQL = f"""
WITH p AS (
    SELECT doc_id,
           substring(hex(encode('{_MAGIC}' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
                     || text)), {HEADER_LEN * 2 + 1}) AS content_hex
    FROM documents
),
bands AS (
    SELECT doc_id, band_idx, {sql_hash32("seg")} AS band_hash
    FROM (
        SELECT doc_id,
               UNNEST(generate_series(1, {PHASH_BANDS})) AS band_idx,
               UNNEST(list_transform(
                   generate_series(1, {PHASH_BANDS}),
                   i -> substring(content_hex,
                        (i - 1) * (CAST(CEIL(length(content_hex) / {2 * PHASH_BANDS}.0)
                                   AS INTEGER) * 2) + 1,
                        CAST(CEIL(length(content_hex) / {2 * PHASH_BANDS}.0)
                             AS INTEGER) * 2))) AS seg
        FROM p
    )
),
hot AS (
    SELECT band_idx, band_hash FROM bands
    GROUP BY band_idx, band_hash HAVING COUNT(*) > {PHASH_HOT_CAP}
),
cold AS (
    SELECT b.doc_id, b.band_idx, b.band_hash
    FROM bands b LEFT JOIN hot h
      ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash
    WHERE h.band_idx IS NULL
),
pairs AS (
    SELECT a.doc_id, b.doc_id AS doc_b,
           COUNT(DISTINCT a.band_idx) AS n_bands
    FROM cold a JOIN cold b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id <> b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
partner AS (
    SELECT doc_id, COUNT(*) AS n_partners, MAX(n_bands) AS best_shared
    FROM pairs GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(SUM(d.band_hash) AS BIGINT) AS band_sum,
       COALESCE(MAX(p.n_partners), 0) AS n_partners,
       COALESCE(MAX(p.best_shared), 0) AS best_shared,
       COALESCE(MAX(p.best_shared), 0) >= {PHASH_MIN_BANDS} AS is_near_dup
FROM bands d LEFT JOIN partner p ON d.doc_id = p.doc_id
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


CHUNK_BYTES = 256


def multimodal_payload_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size BINARY chunking — how large media payloads actually
    move at 100 TB (multipart upload parts, content-defined transport
    blocks, per-chunk integrity hashes): each payload splits into
    {CHUNK_BYTES}-byte slices via binary ``substring`` over a
    ``sequence()`` of offsets (map-side, no shuffle), every chunk gets
    its md5, and reassembly is provable because chunk lengths sum to
    the payload length. Spark operates on the real BINARY column; the
    oracle mirrors on the source string (DuckDB has no BLOB substring/
    md5) — sound because the synthetic payload bytes are pure ASCII
    (asserted across all SFs; Spark's md5 of utf-8 bytes == DuckDB's
    md5 of the equal VARCHAR)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    p = _with_payload(d)
    n_chunks = F.ceil(F.length("payload") / F.lit(CHUNK_BYTES)).cast("int")
    chunks = p.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("payload_bytes"),
        "payload",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_c"),
    )
    chunk = F.expr(f"substring(payload, chunk_idx * {CHUNK_BYTES} + 1, {CHUNK_BYTES})")
    return (
        chunks.select(
            "doc_id",
            "payload_bytes",
            "chunk_idx",
            F.length(chunk).cast("bigint").alias("chunk_bytes"),
            F.md5(chunk).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_PAYLOAD_CHUNKS_SQL = f"""
WITH p AS (
    SELECT doc_id,
           'IMGX' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || text AS payload
    FROM documents
    WHERE doc_id < 50
),
c AS (
    -- unnest(range(...)) instead of a lateral generate_series: DuckDB
    -- table functions cannot take lateral column parameters
    SELECT doc_id,
           CAST(strlen(payload) AS BIGINT) AS payload_bytes,
           payload,
           CAST(unnest(range(0, CAST(CEIL(strlen(payload) / {CHUNK_BYTES}.0) AS BIGINT)))
                AS INTEGER) AS chunk_idx
    FROM p
)
SELECT doc_id, payload_bytes, chunk_idx,
       CAST(strlen(substring(payload, chunk_idx * {CHUNK_BYTES} + 1, {CHUNK_BYTES})) AS BIGINT)
           AS chunk_bytes,
       md5(substring(payload, chunk_idx * {CHUNK_BYTES} + 1, {CHUNK_BYTES})) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_idx
"""


_SNIFF_MAGICS = (
    ("png", "89504E47"),  # \x89PNG
    ("jpeg", "FFD8FFE0"),  # JFIF SOI+APP0
    ("riff", "52494646"),  # RIFF (wav/avi containers)
)


def multimodal_content_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing by MAGIC BYTES over binary payloads — the
    first gate of any media ingestion path (extensions lie; the
    leading bytes don't). Synthetic payloads carry a real 4-byte
    signature (PNG / JPEG-JFIF / RIFF, assigned by doc_id mod 3)
    followed by the document bytes, so the sniffer exercises true
    binary prefix dispatch; unknown content falls through to
    'unknown'.

    The comparison runs in HEX space (``hex(substring(payload, 1,
    4))``) — identical uppercase hex in both engines — and byte
    accounting uses binary length (octet_length in the oracle).

    Scale: map-only signature dispatch + a ≤4-row rollup; payload
    bytes never shuffle (only the per-type integer sums do).
    """
    d = load(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.unhex(F.lit(_SNIFF_MAGICS[0][1])))
        .when(F.col("doc_id") % 3 == 1, F.unhex(F.lit(_SNIFF_MAGICS[1][1])))
        .otherwise(F.unhex(F.lit(_SNIFF_MAGICS[2][1])))
    )
    payload = F.concat(magic, F.col("text").cast("binary"))
    pfx = F.substring(F.hex(payload), 1, 8)
    mtype = (
        F.when(pfx == _SNIFF_MAGICS[0][1], _SNIFF_MAGICS[0][0])
        .when(pfx == _SNIFF_MAGICS[1][1], _SNIFF_MAGICS[1][0])
        .when(pfx == _SNIFF_MAGICS[2][1], _SNIFF_MAGICS[2][0])
        .otherwise("unknown")
    )
    return (
        d.select(mtype.alias("media_type"), F.length(payload).cast("long").alias("nbytes"))
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("nbytes").alias("total_bytes"),
            F.min("nbytes").alias("min_bytes"),
            F.max("nbytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


_SNIFF_SQL = f"""
WITH payloads AS (
    SELECT CASE WHEN doc_id % 3 = 0 THEN unhex('{_SNIFF_MAGICS[0][1]}')
                WHEN doc_id % 3 = 1 THEN unhex('{_SNIFF_MAGICS[1][1]}')
                ELSE unhex('{_SNIFF_MAGICS[2][1]}') END || encode(text) AS payload
    FROM documents
),
sniffed AS (
    SELECT CASE substring(hex(payload), 1, 8)
                WHEN '{_SNIFF_MAGICS[0][1]}' THEN '{_SNIFF_MAGICS[0][0]}'
                WHEN '{_SNIFF_MAGICS[1][1]}' THEN '{_SNIFF_MAGICS[1][0]}'
                WHEN '{_SNIFF_MAGICS[2][1]}' THEN '{_SNIFF_MAGICS[2][0]}'
                ELSE 'unknown' END AS media_type,
           CAST(octet_length(payload) AS BIGINT) AS nbytes
    FROM payloads
)
SELECT media_type, COUNT(*) AS n_files,
       CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
       CAST(MIN(nbytes) AS BIGINT) AS min_bytes,
       CAST(MAX(nbytes) AS BIGINT) AS max_bytes
FROM sniffed
GROUP BY media_type
ORDER BY media_type
"""


AUDIO_FRAME = 256  # samples per analysis frame
AUDIO_HOP = 128  # hop: 50% overlap, the standard STFT framing


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style FRAME analysis over binary payloads: body bytes are
    treated as unsigned 8-bit PCM samples and cut into
    {AUDIO_FRAME}-sample frames at hop {AUDIO_HOP} (the STFT framing
    every audio featurizer uses); per object we emit frame count,
    total and peak frame ENERGY (exact integer Σ sample² — no float
    anywhere) and the peak frame index (first maximum). A real
    deployment swaps the energy kernel for an FFT/mel stage inside the
    same ``mapInPandas`` contract — Arrow batches in, fixed schema
    out, no shuffle; this is the audio sibling of
    ``multimodal_resize``'s stride kernel.

    Short payloads (< {AUDIO_FRAME} samples) analyze as ONE partial
    frame; otherwise only full windows count (trailing tail unframed),
    n_frames = (n − {AUDIO_FRAME}) // {AUDIO_HOP} + 1.

    Scale: embarrassingly parallel numpy over Arrow batches, output
    one fixed-width row per object. Oracle recomputes the identical
    integer sums from the payload bytes via hex-slicing.
    """
    d = load(spark, sf_dir, "documents")
    p = _with_payload(d)

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nsamp, nfr, tot, peak_f, peak_e = [], [], [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                body = np.frombuffer(
                    bytes(raw)[HEADER_LEN:], dtype=np.uint8
                ).astype(np.int64)
                n = len(body)
                if n >= AUDIO_FRAME:
                    n_frames = (n - AUDIO_FRAME) // AUDIO_HOP + 1
                else:
                    n_frames = 1
                cs = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(body * body, out=cs[1:])
                es = [
                    int(cs[min(f * AUDIO_HOP + AUDIO_FRAME, n)] - cs[f * AUDIO_HOP])
                    for f in range(n_frames)
                ]
                ids.append(doc_id)
                nsamp.append(n)
                nfr.append(n_frames)
                tot.append(sum(es))
                pk = max(range(n_frames), key=lambda f: (es[f], -f))
                peak_f.append(pk)
                peak_e.append(es[pk])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": nsamp,
                    "n_frames": nfr,
                    "total_energy": tot,
                    "peak_frame": peak_f,
                    "peak_energy": peak_e,
                }
            )

    return p.mapInPandas(
        energy,
        schema=(
            "doc_id long, n_samples long, n_frames long, "
            "total_energy long, peak_frame long, peak_energy long"
        ),
    ).orderBy("doc_id")


_AUDIO_SQL = f"""
WITH body AS (
    SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
    FROM documents
),
frames AS (
    SELECT doc_id, hx, n,
        CASE WHEN n >= {AUDIO_FRAME}
             THEN (n - {AUDIO_FRAME}) // {AUDIO_HOP} + 1 ELSE 1 END AS n_frames,
        unnest(generate_series(0,
            CASE WHEN n >= {AUDIO_FRAME}
                 THEN (n - {AUDIO_FRAME}) // {AUDIO_HOP} ELSE 0 END)) AS f
    FROM body
),
fe AS (
    SELECT doc_id, n, n_frames, f,
        CAST(list_sum(list_transform(
            generate_series(f * {AUDIO_HOP} + 1, LEAST(f * {AUDIO_HOP} + {AUDIO_FRAME}, n)),
            i -> CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT)
                 * CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT)
        )) AS BIGINT) AS e
    FROM frames
),
agg AS (
    SELECT doc_id, MAX(n) AS n_samples, MAX(n_frames) AS n_frames,
        CAST(SUM(e) AS BIGINT) AS total_energy, MAX(e) AS peak_energy
    FROM fe GROUP BY doc_id
)
SELECT a.doc_id, a.n_samples, a.n_frames, a.total_energy,
    (SELECT MIN(f) FROM fe WHERE fe.doc_id = a.doc_id AND fe.e = a.peak_energy)
        AS peak_frame,
    a.peak_energy
FROM agg a
ORDER BY a.doc_id
"""


VFD_FRAME = 64  # bytes per video "frame" (matches multimodal_frame_sample)


def multimodal_video_frame_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-to-frame MOTION proxy over binary payloads: body bytes cut
    into consecutive {VFD_FRAME}-byte full frames; each transition's
    motion is the exact integer Σ|b_i − b'_i| over aligned bytes — the
    shot-boundary / static-scene detector a video curation pipeline
    runs before deciding which clips are worth decoding. Per object:
    full-frame count, transition count, total and peak motion, and the
    peak transition index (first maximum; −1 when fewer than 2 full
    frames). Same ``mapInPandas`` contract as the other multimodal
    kernels — a real deployment swaps in decoded-luma frame diffs.

    Scale: embarrassingly parallel numpy over Arrow batches, one
    fixed-width row per object; the oracle recomputes the identical
    sums from the payload bytes via hex-slicing.
    """
    d = load(spark, sf_dir, "documents")
    p = _with_payload(d)

    def diff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, ntr, tot, pk_i, pk_m = [], [], [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                body = np.frombuffer(
                    bytes(raw)[HEADER_LEN:], dtype=np.uint8
                ).astype(np.int64)
                n_full = len(body) // VFD_FRAME
                ids.append(doc_id)
                nfr.append(n_full)
                if n_full < 2:
                    ntr.append(0); tot.append(0); pk_i.append(-1); pk_m.append(0)
                    continue
                fr = body[: n_full * VFD_FRAME].reshape(n_full, VFD_FRAME)
                deltas = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                ntr.append(n_full - 1)
                tot.append(int(deltas.sum()))
                pk = int(np.argmax(deltas))  # first max
                pk_i.append(pk)
                pk_m.append(int(deltas[pk]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_full_frames": nfr,
                    "n_transitions": ntr,
                    "total_motion": tot,
                    "peak_transition": pk_i,
                    "peak_motion": pk_m,
                }
            )

    return p.mapInPandas(
        diff,
        schema=(
            "doc_id long, n_full_frames long, n_transitions long, "
            "total_motion long, peak_transition long, peak_motion long"
        ),
    ).orderBy("doc_id")


_VFD_BYTE = "CAST(('0x' || substr(hx, 2 * ({pos}) - 1, 2)) AS BIGINT)"

_VFD_SQL = f"""
WITH body AS (
    SELECT doc_id, hex(encode(text)) AS hx,
        octet_length(encode(text)) // {VFD_FRAME} AS n_full
    FROM documents
),
tr AS (
    SELECT doc_id, n_full,
        unnest(generate_series(0, n_full - 2)) AS f
    FROM body WHERE n_full >= 2
),
deltas AS (
    SELECT t.doc_id, t.n_full, t.f,
        CAST(list_sum(list_transform(generate_series(1, {VFD_FRAME}),
            i -> ABS({_VFD_BYTE.format(pos=f"t.f * {VFD_FRAME} + i")}
                     - {_VFD_BYTE.format(pos=f"(t.f + 1) * {VFD_FRAME} + i")})
        )) AS BIGINT) AS d
    FROM tr t JOIN body b USING (doc_id)
),
agg AS (
    SELECT doc_id, MAX(n_full) AS n_full_frames,
        COUNT(*) AS n_transitions,
        CAST(SUM(d) AS BIGINT) AS total_motion,
        MAX(d) AS peak_motion
    FROM deltas GROUP BY doc_id
)
SELECT b.doc_id,
    b.n_full AS n_full_frames,
    COALESCE(a.n_transitions, 0) AS n_transitions,
    COALESCE(a.total_motion, 0) AS total_motion,
    COALESCE((SELECT MIN(f) FROM deltas d
              WHERE d.doc_id = b.doc_id AND d.d = a.peak_motion), -1)
        AS peak_transition,
    COALESCE(a.peak_motion, 0) AS peak_motion
FROM body b LEFT JOIN agg a USING (doc_id)
ORDER BY b.doc_id
"""


# --------------------------------------------- WebDataset tar index

WDS_SHARDS = 8  # tar shards (doc_id mod)
TAR_BLOCK = 512  # POSIX tar block size


def multimodal_webdataset_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style tar shard index — the manifest a multimodal
    training loader seeks with.  WebDataset stores samples as members
    of plain tar shards; random access needs each member's byte
    offset, which is pure arithmetic over the predecessors: a member
    occupies one {TAR_BLOCK}-byte header plus its payload padded up to
    a {TAR_BLOCK} multiple.

    Offsets are an exact-integer running sum PARTITIONED BY SHARD
    (rows-between window) — every shard computes independently, which
    is the whole point of sharding the dataset: at 100 TB you have
    ~100k shards and the index job is embarrassingly parallel per
    shard with one bounded shuffle on the shard key.  ``data_offset``
    ( = offset + header) is the seek position for the payload itself.
    Payload size derives from the synthetic payload contract
    (header {HEADER_LEN} + utf-8 body, multimodal.py:35)."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    nbytes = (F.length("text") + HEADER_LEN).cast("long")
    padded = (F.ceil(nbytes / TAR_BLOCK) * TAR_BLOCK).cast("long")
    base = d.select(
        "doc_id",
        (F.col("doc_id") % WDS_SHARDS).cast("long").alias("shard"),
        nbytes.alias("payload_bytes"),
        (padded + TAR_BLOCK).alias("member_bytes"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("member_bytes").over(w), F.lit(0)).cast("long")
    return (
        base.select(
            "shard",
            "doc_id",
            "payload_bytes",
            "member_bytes",
            offset.alias("offset"),
            (offset + TAR_BLOCK).alias("data_offset"),
        )
        .orderBy("shard", "doc_id")
    )


_WDS_SQL = f"""
WITH base AS (
    SELECT doc_id,
        CAST(doc_id % {WDS_SHARDS} AS BIGINT) AS shard,
        CAST(strlen(text) + {HEADER_LEN} AS BIGINT) AS payload_bytes,
        CAST(CEIL((strlen(text) + {HEADER_LEN}) / {TAR_BLOCK}.0) * {TAR_BLOCK}
             + {TAR_BLOCK} AS BIGINT) AS member_bytes
    FROM documents
)
SELECT shard, doc_id, payload_bytes, member_bytes,
    CAST(COALESCE(SUM(member_bytes) OVER (
        PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        AS offset,
    CAST(COALESCE(SUM(member_bytes) OVER (
        PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        + {TAR_BLOCK} AS BIGINT) AS data_offset
FROM base
ORDER BY shard, doc_id
"""


# ------------------------------------------------- aspect-ratio bucketing

# SDXL-style training bucket ladder (width, height); ~1 Mpx each so a
# batch is memory-uniform regardless of shape.
ASPECT_BUCKETS = [
    (512, 2048), (576, 1728), (640, 1536), (704, 1408), (768, 1280),
    (832, 1216), (896, 1152), (960, 1088), (1024, 1024), (1088, 960),
    (1152, 896), (1216, 832), (1280, 768), (1408, 704), (1536, 640),
    (1728, 576), (2048, 512),
]
# synthetic-but-deterministic source dims (container has no codecs; a
# real run reads these from multimodal_metadata's decoded header)
_DIM_W = "256 + (doc_id * 37) % 768"
_DIM_H = "256 + (doc_id * 53) % 768"


def multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for image training (the NovelAI/SDXL
    batching scheme): each image is assigned to the ladder bucket with
    the nearest aspect ratio, so a batch contains same-shaped tensors
    and center-crop waste is minimized — the step between "decoded
    metadata" and "training shards" for any vision corpus.

    Dims are the deterministic synthetic ones (no codecs in this
    container — real runs substitute decoder output; the plumbing is
    identical).  Aspect ratios are exact integer micro-units
    ((1e6·w) div h) and the per-image argmin over the {len(ASPECT_BUCKETS)}
    -bucket ladder is a lexicographic struct array_min over a plan
    literal — MAP-ONLY, no explode, no join, no shuffle before the
    final per-bucket aggregate.  Crop waste is the integer
    cross-multiplied deviation |w·bh − h·bw| (the numerator of the
    relative crop fraction).  Output: per bucket — image count, total
    crop-waste numerator, and the member aspect range."""
    d = load(spark, sf_dir, "documents")
    dims = d.select(
        "doc_id",
        F.expr(_DIM_W).cast("long").alias("w"),
        F.expr(_DIM_H).cast("long").alias("h"),
    ).withColumn("ar_micro", F.expr("(1000000 * w) div h"))
    cands = F.array(
        *[
            F.struct(
                F.abs(
                    F.col("ar_micro") - F.lit((1_000_000 * bw) // bh)
                ).alias("dev"),
                F.lit(i).alias("idx"),
                F.lit(bw).alias("bw"),
                F.lit(bh).alias("bh"),
            )
            for i, (bw, bh) in enumerate(ASPECT_BUCKETS)
        ]
    )
    best = dims.withColumn("best", F.array_min(cands)).select(
        "doc_id",
        "ar_micro",
        F.col("best.idx").alias("bucket_idx"),
        F.col("best.bw").alias("bucket_w"),
        F.col("best.bh").alias("bucket_h"),
        F.abs(
            F.col("w") * F.col("best.bh") - F.col("h") * F.col("best.bw")
        ).alias("crop_waste"),
    )
    return (
        best.groupBy("bucket_idx", "bucket_w", "bucket_h")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("crop_waste").alias("sum_crop_waste"),
            F.min("ar_micro").alias("ar_min_micro"),
            F.max("ar_micro").alias("ar_max_micro"),
        )
        .orderBy("bucket_idx")
    )


def _aspect_sql() -> str:
    vals = ", ".join(
        f"({i}, {bw}, {bh}, {(1_000_000 * bw) // bh})"
        for i, (bw, bh) in enumerate(ASPECT_BUCKETS)
    )
    return f"""
WITH buckets(idx, bw, bh, bar_micro) AS (VALUES {vals}),
dims AS (
    SELECT doc_id,
        CAST({_DIM_W} AS BIGINT) AS w,
        CAST({_DIM_H} AS BIGINT) AS h,
        (1000000 * CAST({_DIM_W} AS BIGINT)) // CAST({_DIM_H} AS BIGINT)
            AS ar_micro
    FROM documents
),
ranked AS (
    SELECT d.doc_id, d.ar_micro, b.idx, b.bw, b.bh,
        ABS(d.w * b.bh - d.h * b.bw) AS crop_waste,
        ROW_NUMBER() OVER (
            PARTITION BY d.doc_id
            ORDER BY ABS(d.ar_micro - b.bar_micro) ASC, b.idx ASC
        ) AS rn
    FROM dims d CROSS JOIN buckets b
)
SELECT idx AS bucket_idx,
    CAST(bw AS INTEGER) AS bucket_w,
    CAST(bh AS INTEGER) AS bucket_h,
    COUNT(*) AS n_images,
    CAST(SUM(crop_waste) AS BIGINT) AS sum_crop_waste,
    CAST(MIN(ar_micro) AS BIGINT) AS ar_min_micro,
    CAST(MAX(ar_micro) AS BIGINT) AS ar_max_micro
FROM ranked WHERE rn = 1
GROUP BY idx, bw, bh
ORDER BY bucket_idx
"""


# ------------------------------------------------- ViT patch budget

VIT_PATCH = 14  # ViT-L patch side


MM_PACK_BUDGET = 8192  # interleaved context length (tokens)


def multimodal_interleaved_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved vision-language packing plan — what a
    Flamingo/LLaVA-style trainer actually feeds: each document costs
    TEXT tokens PLUS its image's ViT patch tokens, and sequences are
    packed to the {MM_PACK_BUDGET}-token context across BOTH
    modalities (the pure-text plan in ``seq_pack_chunks`` and the
    pure-vision budget in ``multimodal_patch_token_budget`` each miss
    half the cost). Output per (lang, seq): member docs, text/vision
    token split, and fill rate — the table that prices an interleaved
    training run.

    Same deterministic-shuffle prefix-sum recipe as seq_pack_chunks
    (portable-hash order, window partitioned by lang — shard further
    at 100 TB); image cost is the exact integer patch formula shared
    with the budget op.

    Scale: one corpus pass, one lang-partitioned window, one packed
    aggregate.
    """
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    from parquet_batch_spark.functions.hashing import hash32 as _h32
    from parquet_batch_spark.functions.text import tokens_col as _tc

    t = d.select(
        "doc_id",
        "lang",
        F.size(_tc("text")).cast("long").alias("txt_tok"),
        F.expr(
            f"((({_DIM_W}) + {VIT_PATCH - 1}) div {VIT_PATCH})"
            f" * ((({_DIM_H}) + {VIT_PATCH - 1}) div {VIT_PATCH}) + 1"
        )
        .cast("long")
        .alias("img_tok"),
        _h32(F.col("doc_id").cast("string")).alias("hk"),
    ).withColumn("n_tok", F.col("txt_tok") + F.col("img_tok"))
    w = (
        W.partitionBy("lang")
        .orderBy("hk", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    seq = t.withColumn(
        "seq_id", F.floor(off / F.lit(MM_PACK_BUDGET)).cast("long")
    )
    return (
        seq.groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("txt_tok").alias("text_tokens"),
            F.sum("img_tok").alias("vision_tokens"),
        )
        .select(
            "lang",
            "seq_id",
            "n_docs",
            "text_tokens",
            "vision_tokens",
            F.expr(
                "(1000000 * vision_tokens)"
                " div (text_tokens + vision_tokens)"
            ).alias("vision_share_micro"),
        )
        .orderBy("lang", "seq_id")
    )


def _interleaved_sql() -> str:
    from parquet_batch_spark.functions.hashing import sql_hash32
    from parquet_batch_spark.functions.text import sql_tokens

    return f"""
WITH t AS (
    SELECT doc_id, lang,
        CAST(len({sql_tokens("text")}) AS BIGINT) AS txt_tok,
        CAST(((({_DIM_W}) + {VIT_PATCH - 1}) // {VIT_PATCH})
             * ((({_DIM_H}) + {VIT_PATCH - 1}) // {VIT_PATCH}) + 1
             AS BIGINT) AS img_tok,
        {sql_hash32("CAST(doc_id AS VARCHAR)")} AS hk
    FROM documents
),
seqd AS (
    SELECT lang, txt_tok, img_tok,
        COALESCE(SUM(txt_tok + img_tok) OVER (PARTITION BY lang
            ORDER BY hk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {MM_PACK_BUDGET} AS seq_id
    FROM t
)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
    COUNT(*) AS n_docs,
    CAST(SUM(txt_tok) AS BIGINT) AS text_tokens,
    CAST(SUM(img_tok) AS BIGINT) AS vision_tokens,
    (1000000 * CAST(SUM(img_tok) AS BIGINT))
        // (CAST(SUM(txt_tok) AS BIGINT) + CAST(SUM(img_tok) AS BIGINT))
        AS vision_share_micro
FROM seqd
GROUP BY lang, seq_id
ORDER BY lang, seq_id
"""


def multimodal_patch_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-token budgeting — ``text_tokenizer_fertility``'s
    multimodal sibling: a ViT consumes ⌈w/{VIT_PATCH}⌉·⌈h/{VIT_PATCH}⌉
    patch tokens (+1 CLS) per image, and the per-cohort token budget
    is what decides batch shapes, packing, and training cost for any
    vision corpus (the reason aspect bucketing exists at all).  Dims
    are the deterministic synthetic pair shared with
    ``multimodal_aspect_bucket``.

    Pure integer ceiling division ((x + p − 1) div p — identical in
    both engines, no float), one map-only pass, lang-grain partial
    aggregate.  Output per lang: images, total/mean/max vision
    tokens, and the padding waste of rounding up to patch grids
    (pixels in the padded grid minus real pixels)."""
    d = load(spark, sf_dir, "documents")
    dims = d.select(
        "lang",
        F.expr(_DIM_W).cast("long").alias("w"),
        F.expr(_DIM_H).cast("long").alias("h"),
    ).select(
        "lang",
        "w",
        "h",
        F.expr(f"(w + {VIT_PATCH - 1}) div {VIT_PATCH}").alias("pw"),
        F.expr(f"(h + {VIT_PATCH - 1}) div {VIT_PATCH}").alias("ph"),
    )
    toks = dims.select(
        "lang",
        (F.col("pw") * F.col("ph") + 1).alias("n_tokens"),
        (
            F.col("pw") * F.col("ph") * (VIT_PATCH * VIT_PATCH)
            - F.col("w") * F.col("h")
        ).alias("pad_px"),
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("pad_px").alias("total_pad_px"),
        )
        .withColumn(
            "mean_tokens", F.expr("total_tokens div n_images")
        )
        .orderBy("lang")
    )


_PATCH_SQL = f"""
WITH dims AS (
    SELECT lang,
        CAST({_DIM_W} AS BIGINT) AS w,
        CAST({_DIM_H} AS BIGINT) AS h
    FROM documents
),
toks AS (
    SELECT lang,
        ((w + {VIT_PATCH - 1}) // {VIT_PATCH})
            * ((h + {VIT_PATCH - 1}) // {VIT_PATCH}) + 1 AS n_tokens,
        ((w + {VIT_PATCH - 1}) // {VIT_PATCH})
            * ((h + {VIT_PATCH - 1}) // {VIT_PATCH}) * {VIT_PATCH * VIT_PATCH}
            - w * h AS pad_px
    FROM dims
)
SELECT lang, COUNT(*) AS n_images,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
    CAST(SUM(pad_px) AS BIGINT) AS total_pad_px,
    CAST(SUM(n_tokens) AS BIGINT) // COUNT(*) AS mean_tokens
FROM toks
GROUP BY lang
ORDER BY lang
"""


# ------------------------------------------------- caption alignment

CAP_DIMS = 64  # projection width = embedding width


def multimodal_caption_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style caption↔embedding alignment screen (the LAION
    filter: drop pairs whose text does not match their image).  The
    caption side is projected into the embedding space by signed
    feature hashing — each token lands in dimension h mod {CAP_DIMS}
    with sign ±1 from the next hash bit (sparse random projection of
    the bag of words, one portable md5 per token) — and alignment is
    the cosine between that integer projection and the stored vector.
    With synthetic embeddings the scores center on 0; the operator IS
    the production plumbing (real CLIP text towers just replace the
    projection).

    Exactness: dot product and both norms are exact int64 sums of
    quantized terms (embedding components floored at 1e6 after the
    documented float→double cast); the only float math is the final
    single-expression sqrt/divide rounded to 6 dp — identical
    expression shape in both engines.  Scale: token explode →
    partial-agg to (doc, dim); embedding posexplode to (vec, dim);
    ONE co-partitioned equi-join on (id, dim) — never a row-pair
    join; everything downstream is id-grain aggregation."""
    d = fan_out(load(spark, sf_dir, "documents"), spark, "doc_id")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    h = hash32(F.col("tok"))
    sd = (
        toks.select(
            "doc_id",
            (h % CAP_DIMS).alias("dim"),
            F.when((h / CAP_DIMS).cast("long") % 2 == 0, 1)
            .otherwise(-1)
            .alias("sign"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sign").alias("s"))
    )
    tn2 = sd.groupBy("doc_id").agg(
        F.sum(F.col("s") * F.col("s")).alias("tn2")
    )
    e = fan_out(load(spark, sf_dir, "embeddings"), spark, "vec_id")
    emb = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000).cast("long").alias("q"),
    )
    qn2 = emb.groupBy("vec_id").agg(F.sum(F.col("q") * F.col("q")).alias("qn2"))
    dot = (
        sd.join(emb, (sd.doc_id == emb.vec_id) & (sd.dim == emb.dim))
        .groupBy("doc_id")
        .agg(F.sum(F.col("s") * F.col("q")).alias("dot"))
    )
    cos = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("tn2").cast("double"))
            * F.sqrt(F.col("qn2").cast("double"))
        ),
        6,
    )
    return (
        dot.join(tn2, "doc_id")
        .join(qn2, dot.doc_id == qn2.vec_id)
        .select(
            "doc_id",
            "dot",
            "tn2",
            "qn2",
            cos.alias("cosine"),
            (cos >= 0).alias("aligned"),
        )
        .orderBy("doc_id")
    )


_CAP_ALIGN_SQL = f"""
WITH toks AS (
    SELECT doc_id, UNNEST({sql_tokens("text")}) AS tok FROM documents
),
hashed AS (
    SELECT doc_id,
        {sql_hash32("tok")} % {CAP_DIMS} AS dim,
        CASE WHEN ({sql_hash32("tok")} // {CAP_DIMS}) % 2 = 0
             THEN 1 ELSE -1 END AS sign
    FROM toks
),
sd AS (
    SELECT doc_id, dim, CAST(SUM(sign) AS BIGINT) AS s
    FROM hashed GROUP BY doc_id, dim
),
tn2 AS (
    SELECT doc_id, CAST(SUM(s * s) AS BIGINT) AS tn2 FROM sd GROUP BY doc_id
),
emb AS (
    SELECT vec_id, CAST(dim - 1 AS BIGINT) AS dim,
        CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS q
    FROM (SELECT vec_id, UNNEST(embedding) AS x,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
),
qn2 AS (
    SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS qn2 FROM emb GROUP BY vec_id
),
dots AS (
    SELECT sd.doc_id, CAST(SUM(sd.s * emb.q) AS BIGINT) AS dot
    FROM sd JOIN emb ON sd.doc_id = emb.vec_id AND sd.dim = emb.dim
    GROUP BY sd.doc_id
)
SELECT d.doc_id, d.dot, t.tn2, q.qn2,
    ROUND(CAST(d.dot AS DOUBLE)
          / (SQRT(CAST(t.tn2 AS DOUBLE)) * SQRT(CAST(q.qn2 AS DOUBLE))),
    6) AS cosine,
    ROUND(CAST(d.dot AS DOUBLE)
          / (SQRT(CAST(t.tn2 AS DOUBLE)) * SQRT(CAST(q.qn2 AS DOUBLE))),
    6) >= 0 AS aligned
FROM dots d
JOIN tn2 t ON d.doc_id = t.doc_id
JOIN qn2 q ON d.doc_id = q.vec_id
ORDER BY d.doc_id
"""


QUERIES = {
    "multimodal_interleaved_budget": multimodal_interleaved_budget,
    "multimodal_caption_alignment": multimodal_caption_alignment,
    "multimodal_patch_token_budget": multimodal_patch_token_budget,
    "multimodal_aspect_bucket": multimodal_aspect_bucket,
    "multimodal_webdataset_index": multimodal_webdataset_index,
    "multimodal_audio_energy": multimodal_audio_energy,
    "multimodal_video_frame_diff": multimodal_video_frame_diff,
    "multimodal_content_sniff": multimodal_content_sniff,
    "multimodal_payload_chunks": multimodal_payload_chunks,
    "multimodal_metadata": multimodal_metadata,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_dedup_phash": multimodal_dedup_phash,
}

ORACLES = {
    "multimodal_interleaved_budget": _interleaved_sql(),
    "multimodal_caption_alignment": _CAP_ALIGN_SQL,
    "multimodal_patch_token_budget": _PATCH_SQL,
    "multimodal_aspect_bucket": _aspect_sql(),
    "multimodal_webdataset_index": _WDS_SQL,
    "multimodal_audio_energy": _AUDIO_SQL,
    "multimodal_video_frame_diff": _VFD_SQL,
    "multimodal_content_sniff": _SNIFF_SQL,
    "multimodal_payload_chunks": _PAYLOAD_CHUNKS_SQL,
    "multimodal_metadata": _MULTIMODAL_METADATA_SQL,
    "multimodal_decode_features": _MULTIMODAL_DECODE_SQL,
    "multimodal_resize": _MULTIMODAL_RESIZE_SQL,
    "multimodal_frame_sample": _MULTIMODAL_FRAME_SQL,
    "multimodal_dedup_phash": _PHASH_SQL,
}
