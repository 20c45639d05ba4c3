"""Value-exact checks for the audio/video feature extractors (they are
rows-only in the driver gate, so an independent pure-python computation
over the same blobs is their oracle here — same treatment as
image_features)."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.multimodal import (
    AUDIO_CHUNK_SAMPLES,
    VIDEO_FRAME_BYTES,
    VIDEO_FRAME_STRIDE,
    audio_chunk_features,
    decode_audio,
    round6_half_up,
    video_frame_sample,
)
from golang_mapreduce_spark.sources.fixtures import load_table


def test_decode_audio_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01")


def _blobs(spark, sf_dir, limit=40):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("blob"))
        .orderBy("doc_id")
        .limit(limit)
        .collect()
    )
    return {r["doc_id"]: bytes(r["blob"]) for r in docs}


def test_audio_chunks_value_exact(spark, sf_dir):
    blobs = _blobs(spark, sf_dir)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_samples"], r["rms"])
        for r in audio_chunk_features(spark, sf_dir).collect()
        if r["doc_id"] in blobs
    }
    expected = {}
    for doc_id, data in blobs.items():
        samples = decode_audio(data, fake=True)
        for ci in range(0, len(samples), AUDIO_CHUNK_SAMPLES):
            chunk = samples[ci : ci + AUDIO_CHUNK_SAMPLES]
            rms = round6_half_up(math.sqrt(sum(s * s for s in chunk) / len(chunk)))
            expected[(doc_id, ci // AUDIO_CHUNK_SAMPLES)] = (len(chunk), rms)
    assert got == expected
    assert any(n > 1 for _, (n, _) in got.items())  # real fan-out happened


def test_video_frames_value_exact_and_strided(spark, sf_dir):
    blobs = _blobs(spark, sf_dir)
    got = {}
    for r in video_frame_sample(spark, sf_dir).collect():
        if r["doc_id"] in blobs:
            got[(r["doc_id"], r["frame_idx"])] = (r["frame_md5"], r["mean_byte"])
    expected = {}
    for doc_id, data in blobs.items():
        n_frames = len(data) // VIDEO_FRAME_BYTES
        for fi in range(0, n_frames, VIDEO_FRAME_STRIDE):
            frame = data[fi * VIDEO_FRAME_BYTES : (fi + 1) * VIDEO_FRAME_BYTES]
            expected[(doc_id, fi)] = (
                hashlib.md5(frame.hex().upper().encode()).hexdigest(),
                round6_half_up(sum(frame) / len(frame)),
            )
    assert got == expected
    # the stride actually skipped frames: indices are multiples of stride
    assert all(fi % VIDEO_FRAME_STRIDE == 0 for _, fi in got)


def test_image_resize_value_exact(spark, sf_dir):
    from golang_mapreduce_spark.operators.multimodal import (
        THUMB_H,
        THUMB_W,
        decode_image,
        image_resize,
    )

    blobs = _blobs(spark, sf_dir)
    got = {
        r["doc_id"]: (
            r["src_w"], r["src_h"], r["thumb_w"], r["thumb_h"],
            r["thumb_md5"], r["thumb_mean"],
        )
        for r in image_resize(spark, sf_dir).collect()
        if r["doc_id"] in blobs
    }
    import numpy as np

    expected = {}
    for doc_id, data in blobs.items():
        feats = decode_image(data, fake=True)
        w, h = feats["width"], feats["height"]
        pix = np.resize(np.frombuffer(data, dtype=np.uint8), w * h).reshape(h, w)
        ys = (np.arange(THUMB_H) * h) // THUMB_H
        xs = (np.arange(THUMB_W) * w) // THUMB_W
        thumb = pix[np.ix_(ys, xs)]
        expected[doc_id] = (
            w, h, THUMB_W, THUMB_H,
            hashlib.md5(thumb.tobytes().hex().upper().encode()).hexdigest(),
            round6_half_up(float(thumb.mean())),
        )
    assert got == expected
    # every thumbnail is the fixed target size regardless of source dims
    sizes = {(tw, th) for (_, _, tw, th, _, _) in got.values()}
    assert sizes == {(THUMB_W, THUMB_H)}


def test_phash_empty_blob_dropped_on_both_sides(spark, tmp_path):
    """ADVICE r3: a zero-byte blob used to produce a sig-0 row on the
    Spark side while the oracle's `% n` cell arithmetic NULLed out and
    silently dropped the doc.  Both sides now exclude empty blobs
    up front; parity must hold on a corpus that actually contains one."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from golang_mapreduce_spark.operators.multimodal import (
        IMAGE_PHASH_SQL,
        image_phash_pairs,
    )
    from tests.oracle import compare

    src = "/root/testdata/sf0.001"
    table = pq.read_table(f"{src}/documents.parquet")
    texts = table.column("text").to_pylist()
    empty_id = table.column("doc_id")[0].as_py()
    texts[0] = ""
    i = table.schema.get_field_index("text")
    table = table.set_column(
        i, table.schema.field(i), pa.array(texts, type=table.schema.field(i).type)
    )
    pq.write_table(table, f"{tmp_path}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    df = image_phash_pairs(spark, str(tmp_path))
    compare(df, con, IMAGE_PHASH_SQL, "image_phash_pairs[empty-blob]")
    assert (
        df.where(
            (F.col("doc_a") == empty_id) | (F.col("doc_b") == empty_id)
        ).count()
        == 0
    )
    con.close()
