"""Cross-process disk layer of feeds.cached_index_path (VERDICT-r11
item 1a): a fresh process must REUSE an already-built index instead of
retraining — the driver's correctness gate died mid-window while
rebuilding ANN indexes its own bench child had just built.

The disk slot is content-keyed on (name, sf_dir, source mtime, package
code mtime) with an atomic rename publish guarded by a done-marker, so
a killed half-built dir is never trusted and a code edit can never
serve a stale layout.
"""

from __future__ import annotations

import os

import pytest

from spark_dns_spark.plans import feeds


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    """Isolated disk-cache root + a tiny source parquet stand-in."""
    root = tmp_path / "idxcache"
    monkeypatch.setenv(feeds._DISK_CACHE_ENV, str(root))
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "embeddings.parquet").write_bytes(b"stand-in")
    return str(root), str(sf)


def _build_counter(calls: list):
    def build(out: str) -> None:
        calls.append(out)
        with open(os.path.join(out, "payload"), "w") as fh:
            fh.write("built\n")

    return build


def test_fresh_process_reuses_disk_entry(cache_env):
    _, sf = cache_env
    calls: list = []
    # two EMPTY dicts = two fresh processes (the dict is the per-process
    # layer; the disk slot is what they share)
    p1 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    p2 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    assert p1 == p2
    assert len(calls) == 1, "second fresh process must not rebuild"
    assert os.path.exists(os.path.join(p1, feeds._DONE_MARKER))
    assert open(os.path.join(p1, "payload")).read() == "built\n"


def test_source_mtime_invalidates(cache_env):
    _, sf = cache_env
    calls: list = []
    p1 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    src = os.path.join(sf, "embeddings.parquet")
    os.utime(src, (1, 1))  # regenerated dataset: new mtime
    p2 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    assert p1 != p2
    assert len(calls) == 2


def test_name_namespaces_slots(cache_env):
    _, sf = cache_env
    calls: list = []
    pa = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="a"
    )
    pb = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="b"
    )
    assert pa != pb and len(calls) == 2


def test_unfinished_dir_not_trusted(cache_env):
    _, sf = cache_env
    calls: list = []
    p1 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    os.remove(os.path.join(p1, feeds._DONE_MARKER))
    # the slot lost its marker (tampered / interrupted): it must not be
    # served; the next call rebuilds and re-publishes over it
    p2 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    assert p2 == p1 and len(calls) == 2
    assert os.path.exists(os.path.join(p2, feeds._DONE_MARKER))


def test_disabled_falls_back_to_scratch(cache_env, monkeypatch):
    root, sf = cache_env
    monkeypatch.setenv(feeds._DISK_CACHE_ENV, "0")
    calls: list = []
    p1 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    p2 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    assert not p1.startswith(root) and not p2.startswith(root)
    assert len(calls) == 2, "no disk layer: fresh dicts rebuild"


def test_in_process_dict_still_fronts_disk(cache_env):
    _, sf = cache_env
    calls: list = []
    d: dict = {}
    p1 = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    p2 = feeds.cached_index_path(
        d, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    p3 = feeds.cached_index_path(
        d, sf, "embeddings.parquet", _build_counter(calls), name="t"
    )
    assert p1 == p2 == p3 and len(calls) == 1
    assert any(k[0] == sf for k in d)


def test_unwritable_root_degrades_to_scratch(tmp_path, monkeypatch):
    """A hostile harness may point tmp at an unwritable filesystem — the
    disk layer is an optimization, so the build must fall back to the
    process-lifetime scratch dir instead of dying (r12).  (chmod can't
    simulate this under root, so the publish itself is made to fail.)"""
    root = tmp_path / "cache"
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "embeddings.parquet").write_bytes(b"stand-in")
    monkeypatch.setenv(feeds._DISK_CACHE_ENV, str(root))

    def deny(target, build):
        raise OSError(30, "Read-only file system", target)

    monkeypatch.setattr(feeds, "_disk_publish", deny)
    calls: list = []
    cache: dict = {}
    p = feeds.cached_index_path(
        cache, str(sf), "embeddings.parquet", _build_counter(calls),
        name="t",
    )
    assert len(calls) == 1
    assert open(os.path.join(p, "payload")).read() == "built\n"
    assert not str(p).startswith(str(root))
    # and the process dict still caches the scratch result
    p2 = feeds.cached_index_path(
        cache, str(sf), "embeddings.parquet", _build_counter(calls),
        name="t",
    )
    assert p2 == p and len(calls) == 1


def test_mid_build_failure_leaves_no_temp_dir(cache_env):
    """A build that dies AFTER makedirs (disk-full/quota mid-write) must
    not strand its .build_* temp dir under the cache root — they would
    accumulate across failures (ADVICE r12).  The caller's except arm
    then degrades to scratch, so the query still runs."""
    root, sf = cache_env
    calls: list = []

    def exploding(out: str) -> None:
        calls.append(out)
        if len(calls) == 1:  # only the disk-publish attempt dies
            raise OSError(28, "No space left on device", out)
        with open(os.path.join(out, "payload"), "w") as fh:
            fh.write("built\n")

    p = feeds.cached_index_path(
        {}, sf, "embeddings.parquet", exploding, name="t"
    )
    # degraded to scratch and built there
    assert open(os.path.join(p, "payload")).read() == "built\n"
    assert not str(p).startswith(root)
    # the failed publish cleaned up after itself
    leftovers = [
        d
        for base, dirs, _ in os.walk(root)
        for d in dirs
        if d.startswith(".build_")
    ]
    assert leftovers == [], f"stranded temp build dirs: {leftovers}"
