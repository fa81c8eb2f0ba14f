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


def test_sharded_rejects_multi_axis_mesh(workload):
    """Sharding/all_to_all live on mesh axis 0 only; a second non-trivial
    axis would silently answer probes from the wrong half-shard."""
    import jax
    from jax.sharding import Mesh

    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, _ = workload
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    with pytest.raises(ValueError, match="single-axis mesh"):
        ShardedBFClassifier(index, mesh=Mesh(devs, ("dp", "tp")))


def test_oversized_filter_routes_wide(workload):
    """size_bits past the single-chip int32 ceiling must select the wide
    (hi, lo) limb router instead of raising (the 2^36-bit parity gap,
    reference argument_parser.hpp:130-133 accepts any -b); the SINGLE-chip
    guard must keep firing."""
    from dataclasses import replace

    from shark_tpu.classify.step import StaticMeta
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, _ = workload
    big = replace(index, size_bits=1 << 37)
    clf = ShardedBFClassifier(big, n_devices=8)
    assert clf.wide
    # the jit wrapper must trace/lower with the limb router in place
    clf._fn(64, 128)
    # the single-chip front end still rejects what it cannot address
    with pytest.raises(ValueError, match="single-device int32"):
        StaticMeta.for_index(big, 128)
    # meta construction for the sharded path succeeds
    StaticMeta.for_index(big, 128, allow_wide=True)


def test_wide_owner_local_math():
    """The (hi, lo) limb owner/local-word computation must match a uint64
    numpy oracle at a REAL >2^36-bit geometry (the regime the wide path
    exists for), including shard-boundary-adjacent words."""
    import jax.numpy as jnp

    from shark_tpu.parallel.sharded_bf import shard_owner_local

    n = 8
    size_bits = (1 << 37) + (5 << 33)  # non-power-of-two, > 2^36
    n_words = size_bits // 32
    assert n_words % n == 0
    wps = n_words // n
    rng = np.random.default_rng(11)
    addr = (rng.integers(0, 1 << 62, size=4096, dtype=np.int64).astype(np.uint64)
            % np.uint64(size_bits))
    # exercise every boundary's +-1 word neighborhood explicitly
    edges = []
    for s in range(1, n):
        for d in (-1, 0, 1):
            edges.append((s * wps + d) * 32 + 7)
    addr = np.concatenate([addr, np.asarray(edges, np.uint64)])
    word = addr >> np.uint64(5)
    exp_owner = (word // np.uint64(wps)).astype(np.int64)
    exp_local = (word - exp_owner.astype(np.uint64) * np.uint64(wps)).astype(
        np.int64
    )
    exp_bit = (addr & np.uint64(31)).astype(np.int64)
    idx_hi = jnp.asarray((addr >> np.uint64(32)).astype(np.uint32))
    idx_lo = jnp.asarray((addr & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    owner, local, bit = shard_owner_local(
        idx_hi, idx_lo, n=n, wps=wps, wide=True
    )
    np.testing.assert_array_equal(np.asarray(owner), exp_owner)
    np.testing.assert_array_equal(np.asarray(local), exp_local)
    np.testing.assert_array_equal(np.asarray(bit).astype(np.int64), exp_bit)


def test_wide_matches_single(workload):
    """force_wide pins the limb router at a small size where results can
    execute: the wide pipeline end-to-end must equal the single-device
    classifier bit for bit."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, codes = workload
    single = Classifier(index, max_winners=8, c=0.6)
    wide = ShardedBFClassifier(
        index, max_winners=8, c=0.6, n_devices=8, force_wide=True
    )
    assert wide.wide
    ref = [np.asarray(x) for x in single(codes)]
    got = [np.asarray(x) for x in wide(codes)]
    assert int(got[4].sum()) == 0, "probe bucket overflow"
    for name, a, b in zip(("packed", "winners", "best_cov", "length"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_shard_index_partition(workload):
    from shark_tpu.classify.step import build_pay
    from shark_tpu.parallel.sharded_bf import shard_index

    index, _ = workload
    bf_ranks, pays, wps, counts = shard_index(index, 8)
    assert bf_ranks.shape[0] == 8 and bf_ranks.shape[1] == wps
    # reassembled words must equal the original bit-vector
    np.testing.assert_array_equal(
        bf_ranks[:, :, 0].reshape(-1), index.bf_words
    )
    # concatenated per-shard (tag, payload) rows must equal the global
    # classic probe table exactly (same 8-byte rows ride the reply wire)
    pay = build_pay(index)
    got = np.concatenate([pays[s, : counts[s]] for s in range(8)])
    np.testing.assert_array_equal(got, pay)
    assert int(counts.sum()) == index.n_set_bits


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


def test_probe_cap_adaptive(workload):
    """Default cap = binomial mean + 8 sigma + 64, clamped to [8, b*L]."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, _ = workload
    clf = ShardedBFClassifier(index, n_devices=8)
    mean = 32 * 128 / 8
    expect = int(np.ceil(mean + 8.0 * mean**0.5 + 64.0))
    assert clf._probe_cap(32, 128) == expect
    assert clf._probe_cap(1, 8) == 8  # floor
    # explicit slack reproduces the old blanket sizing
    clf_s = ShardedBFClassifier(index, n_devices=8, slack=2.0)
    assert clf_s._probe_cap(32, 128) == int(np.ceil(2.0 * mean))
    # growth doubles and saturates at all-probes-on-one-owner
    clf.grow_cap()
    assert clf._probe_cap(32, 128) == int(np.ceil(2 * (mean + 8.0 * mean**0.5 + 64.0)))
    for _ in range(10):
        clf.grow_cap()
    assert clf._probe_cap(32, 128) == 32 * 128


def test_reprobe_recovers_overflow(workload):
    """Spill-and-retry: an undersized cap overflows, reprobe() grows it
    until the batch fits, and the result is byte-identical to the
    single-device classifier; the grown cap sticks for later batches."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    index, codes = workload
    single = Classifier(index, max_winners=8, c=0.6)
    sharded = ShardedBFClassifier(
        index, max_winners=8, c=0.6, n_devices=8, slack=0.05
    )
    first = sharded(codes)
    assert int(np.asarray(first[4]).sum()) > 0
    got = sharded.reprobe(codes)
    assert int(np.asarray(got[4]).sum()) == 0
    ref = [np.asarray(x) for x in single(codes)]
    for name, a, b in zip(("packed", "winners", "best_cov", "length"), ref, got):
        np.testing.assert_array_equal(a, np.asarray(b), err_msg=name)
    # subsequent plain calls reuse the grown cap: no overflow, no retry
    again = sharded(codes)
    assert int(np.asarray(again[4]).sum()) == 0


def test_pipeline_retries_sharded_overflow(workload, tmp_path):
    """End-to-end: run_pipeline drains a batch whose routing overflowed and
    recovers through the reprobe hook instead of raising."""
    import io as io_mod

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.config import SharkConfig
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier
    from shark_tpu.pipeline import run_pipeline

    index, codes = workload
    # write a tiny FASTA/FASTQ sample matching the workload's index
    rng = np.random.default_rng(3)
    fasta = tmp_path / "genes.fa"
    with open(fasta, "wb") as f:
        for name, seq in _records_of():
            f.write(b">" + name.encode() + b"\n" + seq + b"\n")
    fastq = tmp_path / "reads.fq"
    n_reads = 64
    with open(fastq, "wb") as f:
        for i in range(n_reads):
            seq = _decode(codes[rng.integers(0, codes.shape[0])])
            f.write(b"@r%03d\n" % i + seq + b"\n+\n" + b"I" * len(seq) + b"\n")
    cfg = SharkConfig(
        fasta_path=str(fasta),
        sample1_path=str(fastq),
        out1_path=str(tmp_path / "o1.fq"),
        batch_size=64,
        k=K,
        use_native=False,
    )
    clf = ShardedBFClassifier(
        index, max_winners=cfg.max_winners, c=cfg.c, n_devices=8, slack=0.05
    )
    ssv = io_mod.StringIO()
    stats = run_pipeline(cfg, ssv_stream=ssv, classifier=clf)
    assert stats["n_reads"] == n_reads
    assert clf.cap_mult > 1.0  # the retry path actually fired
    # equality against the plain single-device pipeline on the same index
    cfg2 = SharkConfig(
        fasta_path=str(fasta),
        sample1_path=str(fastq),
        out1_path=str(tmp_path / "s1.fq"),
        batch_size=64,
        k=K,
        use_native=False,
    )
    ssv2 = io_mod.StringIO()
    run_pipeline(
        cfg2,
        ssv_stream=ssv2,
        classifier=Classifier(index, max_winners=cfg2.max_winners, c=cfg2.c),
    )
    assert ssv.getvalue() == ssv2.getvalue()
    assert (tmp_path / "o1.fq").read_bytes() == (tmp_path / "s1.fq").read_bytes()


def _records_of():
    """The workload fixture's records aren't exposed; regenerate them with
    the same seed/shapes as the module fixture."""
    rng = np.random.default_rng(7)
    out = []
    for g in range(24):
        seq = BASES[rng.integers(0, 4, size=300)].tobytes()
        out.append((f"G{g}", seq))
    return out


def _decode(code_row):
    """codes row -> ACGT bytes (invalid columns dropped from the tail)."""
    sym = np.frombuffer(b"ACGTN", dtype=np.uint8)
    valid = code_row < 4
    last = int(np.flatnonzero(valid).max()) + 1 if valid.any() else 0
    return sym[code_row[:last]].tobytes()


@pytest.mark.parametrize(
    "seed",
    [
        *range(2),
        *(pytest.param(s, marks=pytest.mark.slow) for s in range(2, 6)),
    ],
)
def test_sharded_fuzz_matches_single(seed):
    """Randomized sharded-vs-single equality on the 8-device mesh: random
    gene counts/filter sizes (collision-heavy), reads with Ns, BOTH
    routers (int32 and the wide limb path), byte and packed wire formats
    — the redesigned 8-byte (tag, payload) wire must match the
    single-chip classifier bit for bit on every verdict output."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.parallel.sharded_bf import ShardedBFClassifier

    rng = np.random.default_rng(500 + seed)
    k = int(rng.choice([11, 13, 17]))
    size_bits = 1 << int(rng.integers(13, 17))
    n_genes = int(rng.integers(4, 40))
    records = []
    for g in range(n_genes):
        seq = BASES[rng.integers(0, 4, size=int(rng.integers(k + 10, 400)))]
        records.append((f"G{g}", seq.tobytes()))
    index = build_index(records, k, size_bits)
    L = int(rng.choice([64, 96, 128]))
    B = 8 * int(rng.integers(4, 24))
    codes = np.full((B, L), 4, dtype=np.uint8)
    for i in range(B):
        _, seq = records[rng.integers(0, n_genes)]
        rl = min(len(seq), int(rng.integers(k, L)))
        start = int(rng.integers(0, len(seq) - rl + 1))
        arr = np.frombuffer(seq[start : start + rl], np.uint8).copy()
        mut = rng.random(arr.size) < 0.05
        arr[mut] = rng.choice(
            np.frombuffer(b"ACGTN", np.uint8), size=int(mut.sum())
        )
        codes[i, : arr.size] = encode_bytes(arr.tobytes())
    single = Classifier(index, max_winners=8, c=0.6)
    ref = [np.asarray(x) for x in single(codes)]
    wide = bool(rng.integers(0, 2))
    clf = ShardedBFClassifier(
        index, max_winners=8, c=0.6, n_devices=8, force_wide=wide
    )
    got = [np.asarray(x) for x in clf(codes)]
    assert int(got[4].sum()) == 0, "probe bucket overflow"
    for name, a, b in zip(("packed", "winners", "best_cov", "length"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} (wide={wide})")
    # packed planar wire must agree with the byte wire
    L4, L8 = L // 4, L // 8
    packed = np.zeros((B, L4), dtype=np.uint8)
    vmask = np.zeros((B, L8), dtype=np.uint8)
    for i in range(L):
        c = codes[:, i]
        v = c < 4
        packed[:, i % L4] |= np.where(v, c, 0).astype(np.uint8) << (
            2 * (i // L4)
        )
        vmask[:, i % L8] |= v.astype(np.uint8) << (i // L8)
    got_p = [np.asarray(x) for x in clf.call_packed(packed, vmask)]
    for a, b in zip(got, got_p):
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
