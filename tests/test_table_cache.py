"""Probe-table cache (classify/table_cache.py): roundtrip equality, and —
the failure mode the design exists to prevent — detection of stale and
corrupted caches (a silently wrong table would break the byte-exact
invariant)."""

import numpy as np
import pytest

from shark_tpu.classify import table_cache
from shark_tpu.classify.step import Classifier
from shark_tpu.index.build import build_index
from shark_tpu.ops.kmers import encode_bytes

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 13
SIZE_BITS = 1 << 14


def _workload(seed=7, n_genes=24):
    rng = np.random.default_rng(seed)
    records = []
    for g in range(n_genes):
        seq = BASES[rng.integers(0, 4, size=300)].tobytes()
        records.append((f"G{g}", seq))
    index = build_index(records, K, SIZE_BITS)
    codes = np.full((128, 128), 4, dtype=np.uint8)
    for i in range(128):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, 200))
        codes[i, :80] = encode_bytes(seq[start : start + 80])
    return index, codes


def _no_build(monkeypatch):
    """Make any table BUILD loud — a cache hit must not call the
    builders."""
    from shark_tpu.classify import hashed

    def boom(*a, **k):
        raise AssertionError("cache miss: builder was called")

    monkeypatch.setattr(hashed, "build_hashed_index", boom)
    monkeypatch.setattr(hashed, "build_hashed_xl", boom)


def test_roundtrip_hashed(tmp_path, monkeypatch):
    index, codes = _workload()
    cache = str(tmp_path / "tables")
    c1 = Classifier(index, probe_opts={"cache_dir": cache})
    table_cache.join_pending()
    assert c1.probe == "hashed"
    ref = [np.asarray(x) for x in c1(codes)]
    _no_build(monkeypatch)
    c2 = Classifier(index, probe_opts={"cache_dir": cache})
    assert c2.probe == "hashed"
    assert c2._hmeta == c1._hmeta
    got = [np.asarray(x) for x in c2(codes)]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_xl(tmp_path, monkeypatch):
    index, codes = _workload()
    cache = str(tmp_path / "tables")
    opts = {"cache_dir": cache, "lgB": 10}
    c1 = Classifier(index, probe="xl", probe_opts=opts)
    table_cache.join_pending()
    assert c1.probe == "xl" and c1._hmeta.has_side
    ref = [np.asarray(x) for x in c1(codes)]
    _no_build(monkeypatch)
    c2 = Classifier(index, probe="xl", probe_opts=opts)
    assert c2.probe == "xl"
    assert c2._hmeta == c1._hmeta
    got = [np.asarray(x) for x in c2(codes)]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_key_isolation(tmp_path):
    """A cache written under one request mode / pinned geometry must not
    serve another."""
    index, _ = _workload()
    cache = str(tmp_path / "tables")
    Classifier(index, probe_opts={"cache_dir": cache})
    table_cache.join_pending()
    assert table_cache.load_tables(cache, index, None) is not None
    assert table_cache.load_tables(cache, index, "xl", lgB=10) is None
    assert table_cache.load_tables(cache, index, "hashed") is None


def test_corrupted_cache_detected(tmp_path, capfd):
    index, codes = _workload()
    cache = tmp_path / "tables"
    c1 = Classifier(index, probe_opts={"cache_dir": str(cache)})
    table_cache.join_pending()
    ref = [np.asarray(x) for x in c1(codes)]
    # flip one byte deep inside the table payload
    path = cache / "table.npy"
    raw = bytearray(path.read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    path.write_bytes(bytes(raw))
    assert table_cache.load_tables(str(cache), index, None) is None
    assert "corrupt" in capfd.readouterr().err
    # the classifier falls back to a rebuild and stays exact
    c2 = Classifier(index, probe_opts={"cache_dir": str(cache)})
    got = [np.asarray(x) for x in c2(codes)]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_stale_cache_after_index_change(tmp_path):
    """Rebuilding the index from different content must miss the cache
    (the content digest is the key)."""
    index, _ = _workload(seed=7)
    cache = str(tmp_path / "tables")
    Classifier(index, probe_opts={"cache_dir": cache})
    table_cache.join_pending()
    index2, codes2 = _workload(seed=8)
    assert table_cache.load_tables(cache, index2, None) is None
    c2 = Classifier(index2, probe_opts={"cache_dir": cache})
    table_cache.join_pending()
    # the rebuilt cache now serves index2 (and the verdicts match a
    # cache-free classifier bit for bit)
    assert table_cache.load_tables(cache, index2, None) is not None
    plain = Classifier(index2)
    for a, b in zip(c2(codes2), plain(codes2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_digest_file_roundtrip(tmp_path):
    """SharkIndex.save stores the content digest; load trusts it (stat-
    guarded) so the cache key costs no re-hash; touching an array file
    invalidates the stored digest."""
    import os
    import time

    from shark_tpu.index.structure import SharkIndex

    index, _ = _workload()
    p = str(tmp_path / "index.d")
    index.save(p)
    expect = table_cache.compute_index_digest(index)
    loaded = SharkIndex.load(p)
    assert table_cache.index_digest(loaded) == expect
    # hand-modify an array file: stats change, digest must be recomputed
    # (and still land on the true content digest of the new bytes)
    arr = np.load(os.path.join(p, "bf_words.npy"))
    arr[0] ^= 1
    time.sleep(0.01)  # ensure a distinct mtime_ns
    np.save(os.path.join(p, "bf_words.npy"), arr)
    loaded2 = SharkIndex.load(p)
    got = table_cache.index_digest(loaded2)
    assert got != expect
    assert got == table_cache.compute_index_digest(loaded2)


def test_partial_write_never_published(tmp_path, monkeypatch):
    """An interrupted save leaves no cache at the final path (writes go to
    .partial + atomic rename)."""
    import os

    index, _ = _workload()
    cache = str(tmp_path / "tables")

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(table_cache.np, "save", boom)
    table_cache.save_tables_async(
        cache, index, None, "hashed",
        (np.zeros((4, 2), np.uint32), np.zeros((4, 4), np.uint32),
         __import__("shark_tpu.classify.hashed", fromlist=["HashedMeta"])
         .HashedMeta(lgB=2, has_rows=False)),
    )
    with pytest.raises(RuntimeError, match="disk full"):
        table_cache.join_pending()
    assert not os.path.isdir(cache)
