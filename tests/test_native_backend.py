"""--backend native: the pure-CPU C++ classify path (shk_host_classify).

The invariant is the usual one: byte-exact agreement with the executable
spec (classify/oracle.py) and with the device pipeline's output, including
pair fusion, quality masking, tie emission order, and single mode."""

import io

import numpy as np
import pytest

from shark_tpu.config import SharkConfig
from shark_tpu.index.build import build_index
from shark_tpu.io import native as native_mod
from shark_tpu.ops.kmers import encode_bytes
from shark_tpu.utils.timers import PhaseTimer

pytestmark = pytest.mark.skipif(
    not native_mod.available(), reason="native engine unavailable"
)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 13
SIZE_BITS = 1 << 16  # small filter: plenty of collisions / ties


def _index_and_reads(seed=5, n_genes=16, n_reads=300, L=96):
    rng = np.random.default_rng(seed)
    records = []
    for g in range(n_genes):
        seq = BASES[rng.integers(0, 4, size=260)].tobytes()
        records.append((f"G{g}", seq))
    index = build_index(records, K, SIZE_BITS)
    codes = np.full((n_reads, L), 4, dtype=np.uint8)
    for i in range(n_reads):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, 180))
        arr = np.frombuffer(seq[start : start + 80], np.uint8).copy()
        mut = rng.random(arr.size) < 0.05
        arr[mut] = rng.choice(
            np.frombuffer(b"ACGTN", np.uint8), size=int(mut.sum())
        )
        codes[i, : arr.size] = encode_bytes(arr.tobytes())
    return index, records, codes


@pytest.mark.parametrize("single", [False, True])
def test_host_classify_matches_oracle(single):
    from shark_tpu.classify.oracle import classify_read
    from shark_tpu.pipeline import _ShimIndex

    index, _, codes = _index_and_reads()
    ri, gi = native_mod.host_classify(
        index, codes, codes.shape[0], 0.6, single, threads=3
    )
    shim = _ShimIndex(index)
    want_r, want_g = [], []
    for i in range(codes.shape[0]):
        wins, _, _ = classify_read(shim, codes[i], 0.6, single)
        want_r.extend([i] * len(wins))
        want_g.extend(wins)
    np.testing.assert_array_equal(ri, np.asarray(want_r, np.int32))
    np.testing.assert_array_equal(gi, np.asarray(want_g, np.int32))


def test_host_classify_thread_count_invariant():
    """Contiguous-chunk parallelism: output identical at any thread
    count (deterministic input order, the invariant the reference only
    gets at -t 1)."""
    index, _, codes = _index_and_reads(seed=9)
    ref = native_mod.host_classify(index, codes, codes.shape[0], 0.6, False, 1)
    for t in (2, 4, 7):
        got = native_mod.host_classify(
            index, codes, codes.shape[0], 0.6, False, t
        )
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])


def test_native_backend_matches_python_pipeline(tmp_path):
    """_run_native_host (paired + quality masking) vs the Python-path
    pipeline on the same index: identical ssv + output FASTQs."""
    from shark_tpu.classify.step import Classifier
    from shark_tpu.pipeline import _run_native_host, run_pipeline

    rng = np.random.default_rng(3)
    index, records, _ = _index_and_reads(seed=3)
    fasta = tmp_path / "genes.fa"
    with open(fasta, "wb") as f:
        for name, seq in records:
            f.write(b">" + name.encode() + b"\n" + seq + b"\n")
    fq1, fq2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(fq1, "wb") as f1, open(fq2, "wb") as f2:
        for i in range(200):
            _, seq = records[rng.integers(0, len(records))]
            s = int(rng.integers(0, 120))
            m1 = seq[s : s + 70]
            m2 = seq[s + 60 : s + 130]
            q1 = (rng.integers(2, 41, size=len(m1)) + 33).astype(np.uint8)
            q2 = (rng.integers(2, 41, size=len(m2)) + 33).astype(np.uint8)
            f1.write(b"@p%04d\n" % i + m1 + b"\n+\n" + q1.tobytes() + b"\n")
            f2.write(b"@p%04d\n" % i + m2 + b"\n+\n" + q2.tobytes() + b"\n")

    common = dict(
        fasta_path=str(fasta),
        sample1_path=str(fq1),
        sample2_path=str(fq2),
        k=K,
        min_quality=10,
        batch_size=64,
        max_read_len=144,  # 70 + 1 + 70, padded %8
        threads=3,
    )
    cfg_n = SharkConfig(
        out1_path=str(tmp_path / "n1.fq"),
        out2_path=str(tmp_path / "n2.fq"),
        ssv_path=str(tmp_path / "n.ssv"),
        **common,
    )
    stats = _run_native_host(cfg_n, index, PhaseTimer())
    assert stats["n_reads"] == 200 and stats["probe"] == "host"

    cfg_p = SharkConfig(
        out1_path=str(tmp_path / "p1.fq"),
        out2_path=str(tmp_path / "p2.fq"),
        use_native=False,
        **common,
    )
    ssv = io.StringIO()
    run_pipeline(
        cfg_p, ssv_stream=ssv,
        classifier=Classifier(index, max_winners=cfg_p.max_winners, c=cfg_p.c),
    )
    assert (tmp_path / "n.ssv").read_text() == ssv.getvalue()
    assert (tmp_path / "n1.fq").read_bytes() == (tmp_path / "p1.fq").read_bytes()
    assert (tmp_path / "n2.fq").read_bytes() == (tmp_path / "p2.fq").read_bytes()


@pytest.mark.slow
def test_native_backend_golden(example_dir, tmp_path):
    """The acceptance contract through --backend native: shipped example,
    all three truth files byte-equal — no jax, no device."""
    cfg = SharkConfig(
        fasta_path=str(example_dir / "ENSG00000277117.fa"),
        sample1_path=str(example_dir / "sample_1.fq"),
        sample2_path=str(example_dir / "sample_2.fq"),
        out1_path=str(tmp_path / "s1.fq"),
        out2_path=str(tmp_path / "s2.fq"),
        ssv_path=str(tmp_path / "out.ssv"),
        backend="native",
        threads=4,
    )
    from shark_tpu.pipeline import run_pipeline

    stats = run_pipeline(cfg)
    assert stats["n_reads"] == 5000
    assert (tmp_path / "out.ssv").read_bytes() == (
        example_dir / "ENSG00000277117.truth.ssv"
    ).read_bytes()
    assert (tmp_path / "s1.fq").read_bytes() == (
        example_dir / "sharked.sample_1.truth.fq"
    ).read_bytes()
    assert (tmp_path / "s2.fq").read_bytes() == (
        example_dir / "sharked.sample_2.truth.fq"
    ).read_bytes()
