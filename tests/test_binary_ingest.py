"""Multimodal ingestion plumbing over REAL files: the ``binaryFile``
source -> opaque binary column -> ``mapInPandas`` decode.

The catalog's multimodal queries synthesize payloads from text (the
harness ships no binary fixtures); this suite proves the same decode
pipeline works on the true ingest path a production corpus would use —
bytes on disk, read distributed as Spark's ``binaryFile`` format
(one row per file: path/length/content), modality routed by file
extension via ``pathGlobFilter``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_dns_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def payload_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("payloads")
    for i in range(24):
        ext = "img" if i % 2 == 0 else "aud"
        # deterministic, length-varying, non-trivial first/last bytes
        body = bytes([(i * 7 + 3) % 256]) * (i + 1) + bytes([(i * 13 + 1) % 256])
        (d / f"pay_{i:03d}.{ext}").write_bytes(body)
    return d


def _ingest(spark, payload_dir, glob, kind):
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(str(payload_dir))
    )
    return raw.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"pay_(\d+)", 1
        )
        .cast("long")
        .alias("doc_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("payload"),
    )


def test_binary_file_ingest_decode(spark, payload_dir):
    imgs = _ingest(spark, payload_dir, "*.img", "image")
    feats = {r["doc_id"]: r for r in mm.decode_features(imgs).collect()}
    assert set(feats) == set(range(0, 24, 2))
    for i in range(0, 24, 2):
        body = (payload_dir / f"pay_{i:03d}.img").read_bytes()
        r = feats[i]
        n = len(body)
        assert r["n_bytes"] == n
        assert r["width"] == 64 + n % 577
        assert r["height"] == 64 + (n * 31) % 449
        assert r["n_pixels"] == r["width"] * r["height"]
        assert r["byte_probe"] == body[0] + body[-1]
        assert r["kind"] == "image"


def test_binary_ingest_dedup_on_digest(spark, payload_dir):
    """The relational tier works on digests of real file bytes — the
    payload itself never needs to shuffle for dedup."""
    all_files = _ingest(spark, payload_dir, "*.*", "any")
    digests = all_files.select(
        "doc_id", F.md5("payload").alias("digest"), F.length("payload").alias("n")
    )
    # every synthetic payload is distinct -> dedup keeps all 24
    assert digests.select("digest").distinct().count() == 24
    # and digesting in Python agrees with Spark's md5 over the same bytes
    import hashlib

    row = digests.filter(F.col("doc_id") == 5).collect()[0]
    body = (payload_dir / "pay_005.aud").read_bytes()
    assert row["digest"] == hashlib.md5(body).hexdigest()
    assert row["n"] == len(body)


def test_binary_ingest_partitioned_by_kind(spark, payload_dir):
    """Union the two modality streams and check kind routing + counts —
    the partition-by-modality layout a 100 TB corpus would bucket on."""
    df = _ingest(spark, payload_dir, "*.img", "image").unionByName(
        _ingest(spark, payload_dir, "*.aud", "audio")
    )
    counts = {
        r["kind"]: r["n"]
        for r in df.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"image": 12, "audio": 12}
