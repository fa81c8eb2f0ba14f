"""Sharded-Bloom-filter mode vs the single-device classifier (8-dev CPU mesh)."""

import numpy as np
import pytest

from shark_tpu.classify.step import Classifier
from shark_tpu.index.build import build_index
from shark_tpu.ops.kmers import encode_bytes

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 13
SIZE_BITS = 1 << 14  # 512 words -> 64 words per shard on 8 devices


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(7)
    records = []
    for g in range(24):
        seq = BASES[rng.integers(0, 4, size=300)].tobytes()
        records.append((f"G{g}", seq))
    index = build_index(records, K, SIZE_BITS)
    reads = []
    for _ in range(256):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, 200))
        arr = np.frombuffer(seq[start : start + 80], np.uint8).copy()
        mut = rng.random(arr.size) < 0.04
        arr[mut] = rng.choice(
            np.frombuffer(b"ACGTN", np.uint8), size=int(mut.sum())
        )
        reads.append(arr.tobytes())
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    return index, codes


def test_shard_index_partition(workload):
    from shark_tpu.parallel.sharded_bf import shard_index

    index, _ = workload
    bf_ranks, gene_mats, wps, D = shard_index(index, 8)
    assert bf_ranks.shape[0] == 8 and bf_ranks.shape[1] == wps
    # reassembled words must equal the original bit-vector
    np.testing.assert_array_equal(
        bf_ranks[:, :, 0].reshape(-1), index.bf_words
    )
    # per-shard gene rows must cover every set bit's list exactly
    total_deg = sum(
        int(gene_mats[s][:, 0].astype(np.int64).sum()) for s in range(8)
    )
    assert total_deg == index.gene_ids.size


def test_sharded_matches_single(workload):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, codes = workload
    single = Classifier(index, max_winners=8, c=0.6)
    sharded = ShardedBFClassifier(index, max_winners=8, c=0.6, n_devices=8)
    ref = [np.asarray(x) for x in single(codes)]
    got = [np.asarray(x) for x in sharded(codes)]
    ovf = got[4]
    assert int(ovf.sum()) == 0, "probe bucket overflow"
    for name, a, b in zip(("packed", "winners", "best_cov", "length"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_sharded_packed_matches_bytes(workload):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, codes = workload
    sharded = ShardedBFClassifier(index, max_winners=8, c=0.6, n_devices=8)
    B, L = codes.shape
    L4, L8 = L // 4, L // 8
    packed = np.zeros((B, L4), dtype=np.uint8)
    vmask = np.zeros((B, L8), dtype=np.uint8)
    for i in range(L):  # planar layout, see unpack_codes
        c = codes[:, i]
        v = c < 4
        packed[:, i % L4] |= np.where(v, c, 0).astype(np.uint8) << (
            2 * (i // L4)
        )
        vmask[:, i % L8] |= v.astype(np.uint8) << (i // L8)
    ref = [np.asarray(x) for x in sharded(codes)]
    got = [np.asarray(x) for x in sharded.call_packed(packed, vmask)]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_sharded_overflow_detection(workload):
    """With absurdly small slack the overflow counter must fire (not crash)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, codes = workload
    sharded = ShardedBFClassifier(
        index, max_winners=8, c=0.6, n_devices=8, slack=0.01
    )
    got = sharded(codes)
    assert int(np.asarray(got[4]).sum()) > 0
