"""Multimodal-column operators — treat media as opaque ``binary`` columns
with typed metadata, the pattern a 100 TB multimodal training pipeline
uses (BASELINE.json north star; nothing comparable exists in the
reference, whose only value type is string, worker.go:19-22).

The fixtures carry no real media, so the *bytes* are deterministic fakes
(UTF-8 encoding of the text column) while all Spark-side plumbing —
binary columns, typed metadata structs, Arrow-batched ``mapInPandas``
decode/feature-extract with a stubbed decoder — is real and tested.
Real decoders (PIL/ffmpeg) are not in this container; ``decode_image``
raises NotImplementedError unless ``fake=True``.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.caching import with_shared_caches
from golang_mapreduce_spark.sources.fixtures import load_table


def round6_half_up(x: float) -> float:
    """Round to 6 dp with the HALF_UP-on-shortest-repr rule both engines
    share (Spark's round goes through BigDecimal.valueOf(Double.toString),
    DuckDB ROUND measured identical, e.g. 2.675 -> 2.68, 0.0078125 ->
    0.007813).  Python's builtin round() is half-even on the binary value
    (2.675 -> 2.67), so UDF-side rounding must use this helper for any
    value that later meets an oracle."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


#: 256-row hex-pair -> byte-value lookup used by the media oracles: the
#: blobs are only reachable in ANSI SQL through hex(encode(text)), and a
#: printf('%02X') equality join is the engine-agnostic way back to byte
#: values (no DuckDB-specific byte indexing).
_BYTE_LUT_SQL = (
    "SELECT CAST(i AS INT) AS v, printf('%02X', i) AS h FROM range(256) t(i)"
)


def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on doc_id = vec_id: one row per document
    with text metadata + typed embedding stats (dim, rounded L2 norm,
    label).  Equality join on the id — bucket both tables by id at scale
    and this joins shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "label",
    )
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.size("emb").alias("emb_dim"),
            F.round(
                F.expr("sqrt(aggregate(emb, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"),
                6,
            ).alias("emb_norm"),
            "label",
        )
    )


MULTIMODAL_JOIN_SQL = """
SELECT doc_id, lang, n_chars,
       len(e.embedding) AS emb_dim,
       ROUND(sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v * v))), 6) AS emb_norm,
       e.label
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
"""


def media_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary handling: byte length and content hash of the media
    blob (deterministic fake: UTF-8 bytes of text).  Byte length differs
    from character length exactly when multibyte content appears — the
    distinction a media pipeline must preserve."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        F.lit("text/plain").alias("mime"),
    )


MEDIA_BLOB_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       'text/plain' AS mime
FROM documents
"""


# --- stubbed decode / feature extraction (rows-only check) --------------

def decode_image(data: bytes, fake: bool = False) -> dict:
    """Decode an image blob to pixel features.  Real decoding requires an
    image library not present in this container; the deterministic fake
    derives 'pixel' statistics from the raw bytes so the full pipeline
    (binary column → Arrow batch → feature row) is exercised."""
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/opencv; pass fake=True for the "
            "deterministic byte-derived stand-in"
        )
    head = data[:64]
    return {
        "width": 1 + (len(data) % 512),
        "height": 1 + (len(data) // 512),
        "mean_byte": float(sum(head)) / max(len(head), 1),
    }


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, mean_byte double"
)


def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the (fake) media blobs:
    binary column in, one typed feature row out per blob, Arrow-batched.
    This is the exact harness a real decoder drops into (swap
    ``fake=True`` for the real decode)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob)
                feats = decode_image(data, fake=True)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(data),
                        "width": feats["width"],
                        "height": feats["height"],
                        "mean_byte": feats["mean_byte"],
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(extract, schema=FEATURE_SCHEMA)


#: The fake decode is pure byte arithmetic, so it is SQL-expressible:
#: width/height from octet_length, mean of the first 64 byte values via
#: the hex-pair lookup join.  sum(head)/len(head) is an exact integer sum
#: (< 2^53) divided once in double — bit-identical across engines.
IMAGE_FEATURES_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
lut AS ({_BYTE_LUT_SQL}),
pos AS (
  SELECT doc_id, unnest(range(least(n, 64))) AS p FROM b
),
head AS (
  SELECT pos.doc_id, SUM(l.v) AS s, COUNT(*) AS c
  FROM pos
  JOIN b USING (doc_id)
  JOIN lut l ON substr(b.hx, CAST(2 * pos.p + 1 AS INT), 2) = l.h
  GROUP BY pos.doc_id
)
SELECT b.doc_id,
       CAST(b.n AS INT) AS n_bytes,
       CAST(1 + b.n % 512 AS INT) AS width,
       CAST(1 + b.n // 512 AS INT) AS height,
       COALESCE(CAST(h.s AS DOUBLE) / GREATEST(h.c, 1), 0.0) AS mean_byte
FROM b LEFT JOIN head h USING (doc_id)
"""


def decode_audio(data: bytes, fake: bool = False) -> list[int]:
    """Decode an audio blob to 16-bit PCM samples.  Real decoding needs
    ffmpeg/soundfile (absent here); the deterministic fake interprets
    consecutive byte pairs as little-endian int16 samples."""
    if not fake:
        raise NotImplementedError(
            "real audio decoding needs ffmpeg/soundfile; pass fake=True "
            "for the deterministic byte-pair stand-in"
        )
    usable = len(data) - (len(data) % 2)
    return [
        int.from_bytes(data[i : i + 2], "little", signed=True)
        for i in range(0, usable, 2)
    ]


AUDIO_CHUNK_SAMPLES = 16  # samples per analysis chunk ("frame")

AUDIO_SCHEMA = "doc_id bigint, chunk_idx int, n_samples int, rms double"


def audio_chunk_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked audio analysis over (fake) PCM blobs: each blob fans out
    to one row PER CHUNK (1→N output, unlike image_features' 1→1) with
    the chunk's RMS energy — the framing shape a voice-activity or
    loudness filter needs.  numpy does the per-batch math (Arrow in,
    vectorized reshape/RMS, Arrow out); rounding at 6 dp keeps values
    reproducible for the unit-test oracle."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "n_samples": [], "rms": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob)
                usable = len(data) - (len(data) % 2)
                samples = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64)
                for ci in range(0, len(samples), AUDIO_CHUNK_SAMPLES):
                    chunk = samples[ci : ci + AUDIO_CHUNK_SAMPLES]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(ci // AUDIO_CHUNK_SAMPLES)
                    out["n_samples"].append(len(chunk))
                    out["rms"].append(
                        round6_half_up(float(np.sqrt(np.mean(chunk**2))))
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(extract, schema=AUDIO_SCHEMA)


#: Byte pairs -> signed int16 samples -> 16-sample chunks, all in SQL:
#: the per-chunk sum of squares is an exact integer (<= 16 * 32768^2),
#: so sqrt(sum/count) is the same correctly-rounded double both sides.
AUDIO_CHUNK_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
lut AS ({_BYTE_LUT_SQL}),
idx AS (
  SELECT doc_id, unnest(range(n // 2)) AS si FROM b
),
samp AS (
  SELECT idx.doc_id, idx.si,
         (lo.v + 256 * hi.v)
           - CASE WHEN hi.v >= 128 THEN 65536 ELSE 0 END AS s
  FROM idx
  JOIN b USING (doc_id)
  JOIN lut lo ON substr(b.hx, CAST(4 * idx.si + 1 AS INT), 2) = lo.h
  JOIN lut hi ON substr(b.hx, CAST(4 * idx.si + 3 AS INT), 2) = hi.h
)
SELECT doc_id,
       CAST(si // {AUDIO_CHUNK_SAMPLES} AS INT) AS chunk_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       ROUND(sqrt(CAST(SUM(s * s) AS DOUBLE) / COUNT(*)), 6) AS rms
FROM samp
GROUP BY doc_id, si // {AUDIO_CHUNK_SAMPLES}
"""


VIDEO_FRAME_BYTES = 32   # fake "frame" size
VIDEO_FRAME_STRIDE = 4   # keep every 4th frame

VIDEO_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string, mean_byte double"


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride frame-sampling over (fake) video blobs: the blob splits
    into fixed-size frames and only every {stride}-th frame is decoded
    and fingerprinted — the keyframe-subsampling shape that makes video
    corpora tractable (decode cost drops by the stride factor BEFORE any
    heavy model runs).  1→N/stride output per blob.

    The fingerprint is md5 over the frame's UPPERCASE HEX encoding (not
    the raw bytes): byte-for-byte deterministic, and reachable from ANSI
    SQL (md5(substr(hex(blob), ...))) so the driver can oracle-check the
    values — md5-of-bytes would be invisible to the SQL oracle gate."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": [], "mean_byte": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob)
                n_frames = len(data) // VIDEO_FRAME_BYTES
                for fi in range(0, n_frames, VIDEO_FRAME_STRIDE):
                    frame = data[fi * VIDEO_FRAME_BYTES : (fi + 1) * VIDEO_FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["frame_md5"].append(
                        hashlib.md5(frame.hex().upper().encode()).hexdigest()
                    )
                    out["mean_byte"].append(
                        round6_half_up(sum(frame) / len(frame))
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(extract, schema=VIDEO_SCHEMA)


VIDEO_FRAME_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
lut AS ({_BYTE_LUT_SQL}),
kidx AS (
  SELECT doc_id,
         unnest(range((n // {VIDEO_FRAME_BYTES}
                       + {VIDEO_FRAME_STRIDE - 1}) // {VIDEO_FRAME_STRIDE}))
           AS k
  FROM b
),
frames AS (
  SELECT kidx.doc_id,
         CAST({VIDEO_FRAME_STRIDE} * kidx.k AS INT) AS frame_idx,
         substr(b.hx,
                CAST({2 * VIDEO_FRAME_BYTES * VIDEO_FRAME_STRIDE} * kidx.k + 1
                     AS INT),
                {2 * VIDEO_FRAME_BYTES}) AS fhex
  FROM kidx JOIN b USING (doc_id)
)
SELECT fr.doc_id, fr.frame_idx,
       md5(fr.fhex) AS frame_md5,
       ROUND(CAST(SUM(l.v) AS DOUBLE) / {VIDEO_FRAME_BYTES}, 6) AS mean_byte
FROM frames fr,
     (SELECT unnest(range({VIDEO_FRAME_BYTES})) AS j) q,
     lut l
WHERE substr(fr.fhex, CAST(2 * q.j + 1 AS INT), 2) = l.h
GROUP BY fr.doc_id, fr.frame_idx, fr.fhex
"""


THUMB_W = 8
THUMB_H = 8

RESIZE_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, thumb_w int, thumb_h int, "
    "thumb_md5 string, thumb_mean double"
)


def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch thumbnailing over (fake) image blobs — the resize stage of
    a multimodal ingest pipeline (decode → downsample → re-encode),
    producing a fixed {THUMB_W}x{THUMB_H} thumbnail per image plus its
    checksum.  The fake 'decoder' treats the blob bytes as a 1-channel
    pixel buffer and the 'resize' is nearest-neighbor index sampling
    (numpy fancy-indexing per Arrow batch); a real pipeline swaps the
    two pure functions and keeps the identical mapInPandas plumbing.
    1→1 output with BOUNDED row size — unlike feature extraction, the
    thumbnail payload ships back through Arrow, which is the pattern to
    check batch sizing against (64 bytes/row here; at 256x256x3 set
    spark.sql.execution.arrow.maxRecordsPerBatch so a batch stays under
    executor memory)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "src_w": [], "src_h": [], "thumb_w": [],
                "thumb_h": [], "thumb_md5": [], "thumb_mean": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob)
                feats = decode_image(data, fake=True)
                w, h = feats["width"], feats["height"]
                # fake pixel plane: blob bytes tiled to w*h, row-major
                pix = np.frombuffer(data, dtype=np.uint8)
                pix = np.resize(pix, w * h).reshape(h, w)
                ys = (np.arange(THUMB_H) * h) // THUMB_H
                xs = (np.arange(THUMB_W) * w) // THUMB_W
                thumb = pix[np.ix_(ys, xs)]
                out["doc_id"].append(doc_id)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["thumb_w"].append(THUMB_W)
                out["thumb_h"].append(THUMB_H)
                # md5 over the UPPERCASE HEX of the thumbnail bytes — the
                # SQL-reachable fingerprint convention (see
                # video_frame_sample docstring)
                out["thumb_md5"].append(
                    hashlib.md5(
                        thumb.tobytes().hex().upper().encode()
                    ).hexdigest()
                )
                out["thumb_mean"].append(round6_half_up(float(thumb.mean())))
            yield pd.DataFrame(out)

    return docs.mapInPandas(extract, schema=RESIZE_SCHEMA)


#: Nearest-neighbor sampling is index arithmetic, so the whole resize is
#: SQL-expressible: thumb cell (r,c) reads byte ((r*h//8)*w + c*w//8) mod
#: n (np.resize tiles the blob cyclically), the fingerprint is md5 over
#: the ordered hex pairs, and the mean is an exact /64 division.
IMAGE_RESIZE_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
lut AS ({_BYTE_LUT_SQL}),
dims AS (
  SELECT doc_id, hx, n, 1 + n % 512 AS w, 1 + n // 512 AS h FROM b
),
cells AS (
  SELECT d.doc_id, d.w, d.h, r.r, c.c,
         substr(d.hx,
                CAST(2 * ((((r.r * d.h) // {THUMB_H}) * d.w
                           + ((c.c * d.w) // {THUMB_W})) % d.n) + 1 AS INT),
                2) AS hp
  FROM dims d,
       (SELECT unnest(range({THUMB_H})) AS r) r,
       (SELECT unnest(range({THUMB_W})) AS c) c
)
SELECT cells.doc_id,
       CAST(cells.w AS INT) AS src_w,
       CAST(cells.h AS INT) AS src_h,
       CAST({THUMB_W} AS INT) AS thumb_w,
       CAST({THUMB_H} AS INT) AS thumb_h,
       md5(string_agg(cells.hp, '' ORDER BY cells.r, cells.c)) AS thumb_md5,
       ROUND(CAST(SUM(l.v) AS DOUBLE) / {THUMB_W * THUMB_H}, 6) AS thumb_mean
FROM cells, lut l
WHERE cells.hp = l.h
GROUP BY cells.doc_id, cells.w, cells.h
"""


PHASH_BANDS = 4          # 4 bands x 16 bits over the 64-bit signature
PHASH_HAM_MAX = 3        # banding guarantees recall at Hamming <= 3

PHASH_SCHEMA = "doc_id bigint, sig_lo bigint, sig_hi bigint"


def image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate IMAGE pairs — the multimodal
    counterpart of simhash_neardup_pairs: each (fake-decoded) image is
    reduced to its 8x8 average-hash signature (bit = thumbnail pixel >
    thumbnail mean, the classic aHash), signatures band into
    {PHASH_BANDS}x16 bits, candidates collide on a band bucket, and an
    exact Hamming check (<= {PHASH_HAM_MAX}) verifies — by pigeonhole,
    any pair within Hamming {PHASH_HAM_MAX} of 64 bits agrees on at
    least one full band, so recall at the threshold is perfect while
    the join stays bucket-equality, never all-pairs.

    The signature is stored as two non-negative 32-bit halves in BIGINTs
    (sig_lo = bits 0-31, sig_hi = 32-63) so shift/xor/bit_count behave
    identically across engines with no sign-bit hazard.  Scale: 16 bytes
    per image persist; the bucket join + 2x bit_count verify is the
    SimHash shape, decode cost paid once at ingest."""
    from pyspark.storagelevel import StorageLevel

    # Zero-byte blobs are excluded identically on both sides (ADVICE r3):
    # the Python path would zero-fill an empty pixel buffer into a sig-0
    # row while the oracle's `% n` cell arithmetic NULLs out and drops
    # the doc — same class of real-corpus edge as the zero-vector guard
    # in similarity._cos, so define the semantics once: no pixels, no
    # signature, no pairs.
    #
    # The signature relation feeds FOUR branches of the pair builder
    # (both band sides of the bucket self-join + both sides of the
    # Hamming verify join); unpersisted, the mapInPandas decode+hash
    # pass — the expensive Python boundary — re-ran once per branch
    # (r17; guide §2.4/§5 and the §8 "decode once" rule).  The cache is
    # 3 longs per image, never the blob.
    sigs = phash_signatures(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return with_shared_caches(phash_pairs_from_sigs(sigs), sigs)


def phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig_lo, sig_hi) aHash signature relation — factored out
    of image_phash_pairs so image_phash_clusters can group identical
    signatures before any banding."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("blob"))
        .where(F.octet_length("blob") > 0)
    )

    def sig(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "sig_lo": [], "sig_hi": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(blob)
                feats = decode_image(data, fake=True)
                w, h = feats["width"], feats["height"]
                pix = np.frombuffer(data, dtype=np.uint8)
                pix = np.resize(pix, w * h).reshape(h, w)
                ys = (np.arange(THUMB_H) * h) // THUMB_H
                xs = (np.arange(THUMB_W) * w) // THUMB_W
                thumb = pix[np.ix_(ys, xs)].astype(np.float64)
                m = float(thumb.sum()) / (THUMB_W * THUMB_H)
                bits = (thumb.reshape(-1) > m).astype(np.int64)
                lo = int(sum(int(bits[i]) << i for i in range(32)))
                hi = int(sum(int(bits[i + 32]) << i for i in range(32)))
                out["doc_id"].append(doc_id)
                out["sig_lo"].append(lo)
                out["sig_hi"].append(hi)
            yield pd.DataFrame(out)

    return docs.mapInPandas(sig, schema=PHASH_SCHEMA)


def phash_pairs_from_sigs(sigs: DataFrame) -> DataFrame:
    """Banded-collision + exact-Hamming pair builder over any (doc_id,
    sig_lo, sig_hi) relation — factored out of image_phash_pairs so the
    cluster operator can run it over DISTINCT signatures only (the
    star-collapse optimization; see image_phash_clusters)."""
    band_val = (
        "CASE WHEN bi = 0 THEN sig_lo & 65535 "
        "WHEN bi = 1 THEN shiftright(sig_lo, 16) & 65535 "
        "WHEN bi = 2 THEN sig_hi & 65535 "
        "ELSE shiftright(sig_hi, 16) & 65535 END"
    )
    bands = sigs.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {PHASH_BANDS - 1})")).alias("bi"),
        "sig_lo",
        "sig_hi",
    ).select("doc_id", "bi", F.expr(band_val).alias("bv"))
    a = bands.select(F.col("doc_id").alias("doc_a"), "bi", "bv")
    b = bands.select(F.col("doc_id").alias("doc_b"), "bi", "bv")
    cand = (
        a.join(b, ["bi", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig_lo").alias("lo_a"),
        F.col("sig_hi").alias("hi_a"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig_lo").alias("lo_b"),
        F.col("sig_hi").alias("hi_b"),
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)")
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= PHASH_HAM_MAX)
    )


#: The aHash is byte arithmetic over the same nearest-neighbor thumbnail
#: IMAGE_RESIZE_SQL derives, so the oracle rebuilds the signature in SQL:
#: cell values via the hex-pair lookup, mean as an exact /64 division,
#: bit packing into two 32-bit halves, band bucketing, Hamming via
#: integer xor + bit_count.
IMAGE_PHASH_SQL = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
lut AS ({_BYTE_LUT_SQL}),
dims AS (
  SELECT doc_id, hx, n, 1 + n % 512 AS w, 1 + n // 512 AS h FROM b
),
cells AS (
  SELECT d.doc_id, r.r * {THUMB_W} + c.c AS i,
         substr(d.hx,
                CAST(2 * ((((r.r * d.h) // {THUMB_H}) * d.w
                           + ((c.c * d.w) // {THUMB_W})) % d.n) + 1 AS INT),
                2) AS hp
  FROM dims d,
       (SELECT unnest(range({THUMB_H})) AS r) r,
       (SELECT unnest(range({THUMB_W})) AS c) c
),
vals AS (
  SELECT cells.doc_id, cells.i, l.v
  FROM cells JOIN lut l ON cells.hp = l.h
),
stats AS (
  SELECT doc_id, CAST(SUM(v) AS DOUBLE) / {THUMB_W * THUMB_H} AS m
  FROM vals GROUP BY doc_id
),
sig AS (
  SELECT vals.doc_id,
         CAST(SUM(CASE WHEN vals.i < 32 AND vals.v > s.m
                       THEN (1::BIGINT << vals.i) ELSE 0 END) AS BIGINT) AS sig_lo,
         CAST(SUM(CASE WHEN vals.i >= 32 AND vals.v > s.m
                       THEN (1::BIGINT << (vals.i - 32)) ELSE 0 END) AS BIGINT) AS sig_hi
  FROM vals JOIN stats s USING (doc_id)
  GROUP BY vals.doc_id
),
bands AS (
  SELECT doc_id, bi,
         CASE WHEN bi = 0 THEN sig_lo & 65535
              WHEN bi = 1 THEN (sig_lo >> 16) & 65535
              WHEN bi = 2 THEN sig_hi & 65535
              ELSE (sig_hi >> 16) & 65535 END AS bv
  FROM sig, (SELECT unnest(range({PHASH_BANDS})) AS bi)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2 ON a.bi = b2.bi AND a.bv = b2.bv
  WHERE a.doc_id < b2.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.sig_lo, sb.sig_lo))
            + bit_count(xor(sa.sig_hi, sb.sig_hi)) AS INT) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.sig_lo, sb.sig_lo))
      + bit_count(xor(sa.sig_hi, sb.sig_hi)) <= {PHASH_HAM_MAX}
"""


def blob_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content hash — the modality-agnostic twin of
    dedup_exact: group blobs on md5(bytes), keep the smallest doc_id as
    canonical, report every duplicated blob with its copy count and byte
    mass.  A multimodal pipeline runs THIS before any perceptual pass
    (image_phash_pairs): exact byte dupes are the bulk of crawl
    duplication and cost one hash-groupBy, no decode.

    Scale: map-side md5 (16 bytes/blob shuffled, never the blob), one
    hash aggregate keyed on the digest — partial aggs apply; output is
    only the duplicated groups."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return (
        docs.select(
            F.md5(blob).alias("content_md5"),
            "doc_id",
            F.length(blob).alias("n_bytes"),
        )
        .groupBy("content_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .where(F.col("n_copies") > 1)
    )


BLOB_EXACT_DEDUP_SQL = """
SELECT md5(text) AS content_md5,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS canonical_doc_id,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) > 1
"""


def image_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate IMAGE cluster histogram: connected
    components over the aHash near-dup graph, rolled up to
    (cluster_size, n_clusters) — the media twin of
    dup_cluster_histogram, and the number a crawl-dedup owner reads to
    size the keep-one pass (how much of the image corpus collapses, and
    into how many families).

    STAR-COLLAPSE optimization (the 100 TB load-bearing part): a
    replica-heavy corpus concentrates on a few exact signatures, and
    the naive banded self-join then enumerates every Hamming-0 pair
    inside each signature group — quadratic in group size (measured:
    6.7e9 candidate pairs at the 100x perturbed fixture, 500k images
    but only 5,705 distinct signatures).  Connectivity only needs a
    STAR per signature group (member -> min-doc representative) plus
    the banded pairs over DISTINCT signatures: Hamming distance is a
    function of the signatures alone, so any cross-group edge the full
    join would find exists between the representatives too — the
    components are provably identical (pinned against the full-join
    oracle).  Work drops from O(sum |group|^2) to O(docs + |sigs|^2
    worst case in a band bucket).

    Clustering is the shared pointer-doubling walk (clusters_from —
    O(diameter) rounds, ids-only state); the histogram is two tiny
    aggregates."""
    from pyspark.storagelevel import StorageLevel

    from golang_mapreduce_spark.operators.dedup import clusters_from

    # sigs feeds the group rollup AND the star join; groups feeds the
    # star join AND the rep-pair builder's four branches (via rep_sigs).
    # Unpersisted, every consumer re-ran the Python decode+hash pass
    # (the edges persist inside clusters_from references the union
    # input twice, doubling it again) — r17, guide §2.4/§5.  Both
    # caches are a few longs per row.
    sigs = phash_signatures(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    groups = (
        sigs.groupBy("sig_lo", "sig_hi")
        .agg(F.min("doc_id").alias("rep"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    with_rep = sigs.join(groups, ["sig_lo", "sig_hi"])
    stars = with_rep.where(F.col("doc_id") != F.col("rep")).select(
        F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    rep_sigs = groups.select(
        F.col("rep").alias("doc_id"), "sig_lo", "sig_hi"
    )
    rep_pairs = phash_pairs_from_sigs(rep_sigs).select("doc_a", "doc_b")
    clusters = clusters_from(stars.unionAll(rep_pairs))
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    out = (
        sizes.groupBy(F.col("n_members").cast("bigint").alias("cluster_size"))
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
    )
    return with_shared_caches(out, clusters, sigs, groups)


def _image_phash_clusters_sql() -> str:
    from golang_mapreduce_spark.operators.dedup import cc_walk_sql

    return f"""
WITH RECURSIVE pairs AS (
  {IMAGE_PHASH_SQL.strip()}
),
{cc_walk_sql('pairs')},
sizes AS (
  SELECT cluster_id, COUNT(*) AS n_members FROM clusters GROUP BY cluster_id
)
SELECT CAST(n_members AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY n_members
"""



QUERIES = {
    "image_phash_pairs": image_phash_pairs,
    "multimodal_join": multimodal_join,
    "media_blob_stats": media_blob_stats,
    "image_features": image_features,
    "image_resize": image_resize,
    "audio_chunk_features": audio_chunk_features,
    "video_frame_sample": video_frame_sample,
    "blob_exact_dedup": blob_exact_dedup,
    "image_phash_clusters": image_phash_clusters,
}

# The decode stubs are deterministic byte arithmetic, so every media
# query is oracle-backed: the SQL reaches the blob bytes through
# hex(encode(text)) + the 256-row hex-pair lookup (value-exact unit
# tests in tests/test_multimodal_av.py additionally pin the python
# computation).  A real (PIL/ffmpeg) decoder would demote image/audio/
# video back to rows-only — the SQL gate is a property of the fake.
ORACLES = {
    "image_phash_pairs": IMAGE_PHASH_SQL,
    "multimodal_join": MULTIMODAL_JOIN_SQL,
    "media_blob_stats": MEDIA_BLOB_SQL,
    "image_features": IMAGE_FEATURES_SQL,
    "image_resize": IMAGE_RESIZE_SQL,
    "audio_chunk_features": AUDIO_CHUNK_SQL,
    "video_frame_sample": VIDEO_FRAME_SQL,
    "blob_exact_dedup": BLOB_EXACT_DEDUP_SQL,
    "image_phash_clusters": _image_phash_clusters_sql(),
}
