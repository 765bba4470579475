"""Multimodal operator tests — the mapInPandas decode plumbing
(batch iteration, schema, byte access) and the real-codec stub gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_dns_spark.operators import multimodal as mm
from spark_dns_spark.session import load_table


def test_real_decoder_is_stubbed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        mm.modality_kind("doc_id").alias("kind"),
        mm.payload_from_text("text").alias("payload"),
    )
    for real in ("image", "audio", "video"):
        with pytest.raises(NotImplementedError):
            mm.decode_features(docs, decoder=real)
    with pytest.raises(ValueError):
        mm.decode_features(docs, decoder="nope")


def test_decode_byte_probe_non_ascii(spark):
    """The byte_probe and its oracle must agree at the OCTET level, not
    the codepoint level (ADVICE r3): é is codepoint 233 but UTF-8 bytes
    0xC3 0xA9 — a codepoint oracle diverges on any non-ASCII corpus."""
    import duckdb

    texts = ["abc", "", "é", "日本語", "aé", "ωmega", "end→"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select(
        "doc_id",
        mm.modality_kind("doc_id").alias("kind"),
        mm.payload_from_text("text").alias("payload"),
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["byte_probe"])
        for r in mm.decode_features(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") v(doc_id, text)"
    )
    oracle = con.execute(
        """
        SELECT doc_id, strlen(text),
               CASE WHEN strlen(text) = 0 THEN 0 ELSE
                 CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT)
                 + CAST('0x' || substr(hex(encode(text)),
                                       length(hex(encode(text))) - 1, 2) AS INT)
               END
        FROM t
        """
    ).fetchall()
    for doc_id, n_bytes, probe in oracle:
        assert got[doc_id] == (n_bytes, probe), texts[doc_id]
    # ground truth straight from Python bytes
    for i, t in enumerate(texts):
        b = t.encode()
        assert got[i] == (len(b), (b[0] + b[-1]) if b else 0), t


def test_decode_survives_small_arrow_batches(spark, sf_dir):
    """The decoder must be correct across MANY Arrow batches (the 100 TB
    case is thousands of batches per partition), not just one."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        docs = load_table(spark, sf_dir, "documents")
        blobs = docs.select(
            "doc_id",
            mm.modality_kind("doc_id").alias("kind"),
            mm.payload_from_text("text").alias("payload"),
        )
        out = mm.decode_features(blobs)
        assert out.columns == [
            "doc_id", "kind", "n_bytes", "width", "height", "n_pixels",
            "byte_probe",
        ]
        rows = {r.doc_id: r for r in out.collect()}
        src = {r.doc_id: r.text for r in docs.collect()}
        assert len(rows) == len(src)
        # spot-check the byte arithmetic against raw text bytes
        for doc_id in list(src)[:25]:
            raw = src[doc_id].encode("utf-8")
            r = rows[doc_id]
            assert r.n_bytes == len(raw)
            assert r.width == 64 + len(raw) % 577
            assert r.height == 64 + (len(raw) * 31) % 449
            assert r.n_pixels == r.width * r.height
            assert r.byte_probe == raw[0] + raw[-1]
            assert r.kind == ("image", "audio", "video")[doc_id % 3]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_frame_sample_matches_sequential_replay(spark):
    """The row-expanding demux must equal a driver-side sequential
    replay of the same geometry — frame boundaries, stride, and byte
    values, including docs shorter than one frame (zero rows) and
    non-ASCII payloads (octet-level indexing)."""
    texts = [
        "x" * 300,          # 4 frames -> idx 0 sampled... (300//64 = 4)
        "short",            # < 1 frame -> no rows
        "é" * 200,          # 400 bytes (2/char) -> 6 frames
        "",                 # empty -> no rows
        "a" * 1024,         # 16 frames -> idx 0,4,8,12
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", mm.payload_from_text("text").alias("payload"))
    got = sorted(
        (r["doc_id"], r["frame_idx"], r["frame_offset"], r["frame_byte"])
        for r in mm.frame_sample(df).collect()
    )
    want = []
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        for fi in range(0, len(b) // mm.FRAME_BYTES, mm.FRAME_STRIDE):
            want.append((i, fi, fi * mm.FRAME_BYTES, b[fi * mm.FRAME_BYTES]))
    assert got == sorted(want)
    assert any(r[0] == 2 for r in got)  # non-ASCII doc did emit frames
    assert not any(r[0] in (1, 3) for r in got)


def test_resize_nn_matches_sequential_replay(spark):
    """The NN resize must equal a driver-side replay of the raster
    arithmetic — out[i][j] = in[2i*W + 2j] — including sub-raster docs
    (out_h 0, md5 of empty) and non-ASCII payloads."""
    import hashlib

    texts = [
        "x" * 300,   # h=9 rows  -> out 4x16
        "short",     # h=0       -> out 0x16, empty digest
        "é" * 200,   # 400 bytes -> h=12 -> out 6x16
        "",          # h=0
        "a" * 1024,  # h=32      -> out 16x16
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", mm.payload_from_text("text").alias("payload"))
    got = sorted(tuple(r) for r in mm.resize_nn(df).collect())

    want = []
    w = mm.RESIZE_W
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        h = len(b) // w
        h2, w2 = h // 2, w // 2
        flat = bytes(
            b[(2 * r) * w + 2 * c] for r in range(h2) for c in range(w2)
        )
        want.append(
            (
                i,
                h,
                h2,
                w2,
                sum(flat),
                hashlib.md5(flat.hex().upper().encode()).hexdigest(),
            )
        )
    assert got == sorted(want)
    empty = hashlib.md5(b"").hexdigest()
    assert [r[5] for r in got if r[0] in (1, 3)] == [empty, empty]
