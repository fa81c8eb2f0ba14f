"""Native C++ host I/O engine vs the pure-Python path."""

import subprocess
import sys

import numpy as np
import pytest

from shark_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)


def test_native_encode_matches_python(example_dir):
    from shark_tpu.io.encode import encode_batch
    from shark_tpu.io.fastx import read_fastq_pairs

    B, L = 512, 256
    ns = native.NativeStream(
        str(example_dir / "sample_1.fq"),
        str(example_dir / "sample_2.fq"),
        B,
        L,
        0,
    )
    pairs = read_fastq_pairs(
        str(example_dir / "sample_1.fq"), str(example_dir / "sample_2.fq")
    )
    it = iter(pairs)
    total = 0
    while True:
        nb = ns.next_batch()
        if nb is None:
            break
        codes, slot, n = nb
        recs1, recs2 = [], []
        for _ in range(n):
            r1, r2 = next(it)
            recs1.append(r1)
            recs2.append(r2)
        ref = encode_batch(recs1, recs2, 0, B, L)
        np.testing.assert_array_equal(codes[:n], ref.codes[:n])
        total += n
        ns.release(slot)
    assert total == 5000
    ns.close()


def test_native_packed_mode_roundtrip(example_dir):
    """Packed 2-bit output must unpack to the byte codes."""
    from shark_tpu.pipeline import _unpack_row_np

    B, L = 256, 256
    ns1 = native.NativeStream(
        str(example_dir / "sample_1.fq"), "", B, L, 0, packed=False
    )
    ns2 = native.NativeStream(
        str(example_dir / "sample_1.fq"), "", B, L, 0, packed=True
    )
    for _ in range(3):
        codes, s1, n1 = ns1.next_batch()
        packed, vmask, s2, n2 = ns2.next_batch()
        assert n1 == n2
        for i in range(0, n1, 37):
            np.testing.assert_array_equal(
                _unpack_row_np(packed[i], vmask[i]), codes[i]
            )
        ns1.release(s1)
        ns2.release(s2)
    ns1.close()
    ns2.close()


def test_unpack_codes_device_matches_host(example_dir):
    import jax.numpy as jnp

    from shark_tpu.classify.step import unpack_codes
    from shark_tpu.pipeline import _unpack_row_np

    rng = np.random.default_rng(0)
    B, L = 16, 64
    packed = rng.integers(0, 256, size=(B, L // 4), dtype=np.uint8)
    vmask = rng.integers(0, 256, size=(B, L // 8), dtype=np.uint8)
    dev = np.asarray(unpack_codes(jnp.asarray(packed), jnp.asarray(vmask)))
    for i in range(B):
        np.testing.assert_array_equal(dev[i], _unpack_row_np(packed[i], vmask[i]))


def test_native_quality_masking(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_bytes(b"@r1\nACGT\n+\nII!I\n")  # '!' = phred 0
    ns = native.NativeStream(str(fq), "", 4, 16, 10)
    codes, slot, n = ns.next_batch()
    assert n == 1
    assert codes[0, :4].tolist() == [0, 1, 4, 3]  # low-qual G masked
    ns.close()


def test_native_gzip(tmp_path, example_dir):
    import gzip

    raw = (example_dir / "sample_1.fq").read_bytes()
    gz = tmp_path / "s.fq.gz"
    head = b"".join(raw.splitlines(keepends=True)[:400])  # 100 records
    gz.write_bytes(gzip.compress(head))
    ns = native.NativeStream(str(gz), "", 1024, 256, 0)
    got = 0
    while (nb := ns.next_batch()) is not None:
        got += nb[2]
    assert got == 100
    ns.close()


def test_native_malformed_record_raises(tmp_path, example_dir):
    """A record truncated mid-qual must surface as an error, not silent
    EOF (the Python parser raises for the same input)."""
    raw = (example_dir / "sample_1.fq").read_bytes()
    bad = tmp_path / "bad.fq"
    bad.write_bytes(raw[: 4 * 400])  # cuts inside a record
    ns = native.NativeStream(str(bad), "", 1024, 256, 0)
    with pytest.raises(ValueError, match="malformed"):
        while ns.next_batch() is not None:
            pass
    ns.close()


def test_native_index_build_matches_python(example_dir):
    from shark_tpu.index.build import build_index
    from shark_tpu.io.fastx import read_fasta
    from shark_tpu.io.native import build_index_native

    size_bits = 1 << 20
    py = build_index(
        read_fasta(str(example_dir / "ENSG00000277117.fa")), 17, size_bits
    )
    nat = build_index_native(
        str(example_dir / "ENSG00000277117.fa"), 17, size_bits
    )
    assert nat is not None
    assert nat.gene_names == py.gene_names
    for f in ("bf_words", "word_rank", "offsets", "gene_ids"):
        np.testing.assert_array_equal(
            getattr(nat, f), getattr(py, f), err_msg=f
        )


def test_native_index_build_matches_python_edge_cases(tmp_path):
    """Multi-gene FASTA exercising the fill-in-place ABI's boundary logic:
    a record shorter than k (still consumes a gene id, main.cpp:186), an
    N-broken sequence, genes sharing k-mers (multi-gene CSR rows), and a
    record with an empty sequence."""
    import numpy as np

    from shark_tpu.index.build import build_index
    from shark_tpu.io.fastx import read_fasta
    from shark_tpu.io.native import build_index_native

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    core = bases[rng.integers(0, 4, 64)].tobytes()
    recs = [
        ("short", b"ACGTACGT"),  # < k: no k-mers, id still assigned
        ("g1", core + bases[rng.integers(0, 4, 100)].tobytes()),
        ("empty", b""),
        ("g2", bases[rng.integers(0, 4, 50)].tobytes() + core),  # shares core
        ("nbreak", b"ACGTNNNN" + bases[rng.integers(0, 4, 40)].tobytes()),
    ]
    fa = tmp_path / "edge.fa"
    fa.write_bytes(
        b"".join(b">" + n.encode() + b"\n" + s + b"\n" for n, s in recs)
    )
    size_bits = 1 << 16
    py = build_index(read_fasta(str(fa)), 17, size_bits)
    nat = build_index_native(str(fa), 17, size_bits)
    assert nat is not None
    assert nat.gene_names == py.gene_names == [n for n, _ in recs]
    for f in ("bf_words", "word_rank", "offsets", "gene_ids"):
        np.testing.assert_array_equal(
            getattr(nat, f), getattr(py, f), err_msg=f
        )
    assert py.max_degree >= 2  # the shared core produced multi-gene rows

    # empty FASTA: zero genes, empty CSR, all-zero filter
    empty = tmp_path / "none.fa"
    empty.write_bytes(b"")
    nat0 = build_index_native(str(empty), 17, size_bits)
    assert nat0 is not None
    assert nat0.gene_names == []
    assert nat0.n_set_bits == 0
    assert int(nat0.bf_words.sum()) == 0


def test_native_multi_encoder_threads_deterministic(example_dir):
    """Several encoder threads may FILL ring slots out of order; the
    consumer must still see identical batches in identical order."""
    def collect(encode_threads):
        ns = native.NativeStream(
            str(example_dir / "sample_1.fq"),
            str(example_dir / "sample_2.fq"),
            256,
            256,
            10,
            packed=True,
            encode_threads=encode_threads,
        )
        out = []
        while True:
            nb = ns.next_batch()
            if nb is None:
                break
            packed, vmask, slot, n = nb
            out.append((packed.copy(), vmask.copy(), n))
            ns.release(slot)
        ns.close()
        return out

    a = collect(1)
    b = collect(3)
    assert len(a) == len(b)
    for (pa, va, na), (pb, vb, nb_) in zip(a, b):
        assert na == nb_
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(va, vb)


def test_native_write_error_surfaces(example_dir, tmp_path):
    """Disk-full (ENOSPC via /dev/full) must surface as an error, not a
    'successful' truncated run (shk_emit returns -2 / shk_close nonzero;
    reference ReadOutput.hpp ignores printf results — we must not)."""
    import os

    if not os.path.exists("/dev/full"):
        pytest.skip("/dev/full not available")

    # (a) a large emit overflows the stdio buffer mid-batch -> OSError
    ns = native.NativeStream(
        str(example_dir / "sample_1.fq"), "", 8192, 256, 0
    )
    ns.set_output(-1, "/dev/full", str(tmp_path / "o1.fq"), "")
    ns.register_genes(["GENE"])
    nb = ns.next_batch()
    assert nb is not None
    codes, slot, n = nb
    ri = np.arange(n, dtype=np.int32)
    gi = np.zeros(n, dtype=np.int32)
    with pytest.raises(OSError):
        ns.emit(slot, ri, gi)
        ns.close()  # in case the buffer absorbed it: error surfaces at flush
    try:  # join the parser threads; the latched error may re-raise
        ns.close()
    except OSError:
        pass

    # (b) a tiny emit stays in the buffer; close() must still report it
    ns2 = native.NativeStream(
        str(example_dir / "sample_1.fq"), "", 64, 256, 0
    )
    ns2.set_output(-1, "/dev/full", str(tmp_path / "o2.fq"), "")
    ns2.register_genes(["GENE"])
    codes, slot, n = ns2.next_batch()
    ns2.emit(slot, np.zeros(1, dtype=np.int32), np.zeros(1, dtype=np.int32))
    with pytest.raises(OSError):
        ns2.close()


def test_scan_max_fused(example_dir, tmp_path):
    """Parse-only max-fused-length scan: single, paired (junction +1),
    gzip, and the reference's stop-at-either-EOF pairing."""
    import gzip

    s1 = str(example_dir / "sample_1.fq")
    s2 = str(example_dir / "sample_2.fq")
    assert native.scan_max_fused(s1) == 100
    assert native.scan_max_fused(s1, s2) == 201  # 100 + 'N' + 100

    # gzip input
    gz = tmp_path / "s.fq.gz"
    with gzip.open(gz, "wb") as f:
        f.write(b"@a\nACGTACGT\n+\nIIIIIIII\n@b\nACG\n+\nIII\n")
    assert native.scan_max_fused(str(gz)) == 8

    # pairing stops at either EOF: the long third read of f1 has no mate
    # and must not count (FastqSplitter.hpp:61 loops while BOTH parse)
    f1 = tmp_path / "p1.fq"
    f2 = tmp_path / "p2.fq"
    f1.write_bytes(
        b"@a\nACGT\n+\nIIII\n@b\nAC\n+\nII\n@c\n" + b"A" * 500 + b"\n+\n"
        + b"I" * 500 + b"\n"
    )
    f2.write_bytes(b"@a\nAC\n+\nII\n@b\nACGTA\n+\nIIIII\n")
    assert native.scan_max_fused(str(f1), str(f2)) == 2 + 1 + 5

    # empty sample
    empty = tmp_path / "e.fq"
    empty.write_bytes(b"")
    assert native.scan_max_fused(str(empty)) == 0

    with pytest.raises(OSError):
        native.scan_max_fused(str(tmp_path / "missing.fq"))


def test_native_build_fastq_reference_matches_python(tmp_path):
    """A FASTQ-format reference (kseq parity: the reference's FastaSplitter
    runs on kseq, main.cpp:31-32) must index identically through the native
    and Python builders — including quality lines that start with '@'/'>'
    or contain ACGT bytes, which a raw line parser would misread as phantom
    genes/sequence."""
    from shark_tpu.index.build import build_index
    from shark_tpu.io.fastx import read_fasta
    from shark_tpu.io.native import build_index_native

    ref = tmp_path / "genes.fq"
    ref.write_bytes(
        b"@gene_a extra tokens\n"
        b"ACGTACGTACGTACGTACGT\n"
        b"+\n"
        b"@@FFFDDDHHIIACGTACGT\n"  # starts with '@', contains ACGT bytes
        b">gene_b\n"               # mixed FASTA record in the same file
        b"TTTTGGGGCCCCAAAATTTT\n"
        b"@gene_c\n"
        b"CCCCGGGGTTTTAAAACCCC\n"
        b"+\n"
        b">IIIIIIIIIIIIIIIIIII\n"  # starts with '>'
    )
    k, bits = 7, 1 << 12
    nat = build_index_native(str(ref), k, bits, threads=2)
    py = build_index(read_fasta(str(ref)), k, bits)
    assert nat.gene_names == py.gene_names == ["gene_a", "gene_b", "gene_c"]
    np.testing.assert_array_equal(nat.bf_words, py.bf_words)
    np.testing.assert_array_equal(nat.word_rank, py.word_rank)
    np.testing.assert_array_equal(nat.offsets, py.offsets)
    np.testing.assert_array_equal(nat.gene_ids, py.gene_ids)


def test_native_build_size_bits_guard(example_dir):
    """The native builder must reject the sizes the Python builder rejects
    (a non-multiple of 32 would write past the bf_words buffer; 0 would
    divide by zero in the hash modulo), and the k range both builders
    encode in 2 bits/base (k >= 32 silently overflows the uint64 k-mer)."""
    from shark_tpu.index.build import build_index
    from shark_tpu.io.native import build_index_native

    fa = str(example_dir / "ENSG00000277117.fa")
    for bad in (0, 100, 96):
        with pytest.raises(ValueError, match="multiple of 64"):
            build_index_native(fa, 17, bad)
    for bad_k in (0, 32):
        with pytest.raises(ValueError, match="range"):
            build_index_native(fa, bad_k, 1 << 14)
        with pytest.raises(ValueError, match="range"):
            build_index([("g", b"ACGT" * 20)], bad_k, 1 << 14)


def test_ring_exhaustion_is_an_error(example_dir):
    """Pinning more batches than the prefetch ring holds must raise, not
    silently re-consume a stale slot as new data."""
    k_ring = native.ring_capacity()
    assert k_ring < 5000  # the sample must be able to overfill the ring
    ns = native.NativeStream(
        str(example_dir / "sample_1.fq"), "", 1, 104, 0
    )
    try:
        with pytest.raises(ValueError, match="prefetch ring exhausted"):
            for _ in range(k_ring + 5):  # never release
                assert ns.next_batch() is not None
    finally:
        ns.close()


def test_fetch_group_validated():
    from shark_tpu.config import SharkConfig

    cfg = SharkConfig(
        fasta_path="x.fa", sample1_path="y.fq", fetch_group=7
    )
    with pytest.raises(ValueError, match="fetch_group"):
        cfg.validate()


def test_len_scan_gating(example_dir, tmp_path):
    """The auto-length scan must not engage for explicit geometry, resume
    runs, Python-path runs, or non-regular inputs."""
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _start_len_scan

    s1 = str(example_dir / "sample_1.fq")
    base = dict(fasta_path="x.fa", sample1_path=s1, ssv_path="o.ssv")

    join = _start_len_scan(SharkConfig(**base), None)
    assert join is not None and join() == 100

    assert _start_len_scan(SharkConfig(**base, max_read_len=128), None) is None
    assert _start_len_scan(SharkConfig(**base, resume=True), None) is None
    assert _start_len_scan(SharkConfig(**base, use_native=False), None) is None
    assert _start_len_scan(SharkConfig(**base), object()) is None  # ssv_stream

    missing = dict(base, sample1_path=str(tmp_path / "nope.fq"))
    assert _start_len_scan(SharkConfig(**missing), None) is None  # not a file


def _run_native_golden(example_dir, tmp_path, **cfg_overrides):
    """Run the paired example through the native pipeline with the given
    config overrides, assert byte-equality with all three truth files, and
    return the run stats for extra assertions."""
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import run_pipeline

    out1 = tmp_path / "out1.fq"
    out2 = tmp_path / "out2.fq"
    ssv = tmp_path / "out.ssv"
    cfg = SharkConfig(
        fasta_path=str(example_dir / "ENSG00000277117.fa"),
        sample1_path=str(example_dir / "sample_1.fq"),
        sample2_path=str(example_dir / "sample_2.fq"),
        out1_path=str(out1),
        out2_path=str(out2),
        ssv_path=str(ssv),
        **cfg_overrides,
    )
    stats = run_pipeline(cfg)
    assert stats.get("native"), "native path not taken"
    assert ssv.read_bytes() == (
        example_dir / "ENSG00000277117.truth.ssv"
    ).read_bytes()
    assert out1.read_bytes() == (
        example_dir / "sharked.sample_1.truth.fq"
    ).read_bytes()
    assert out2.read_bytes() == (
        example_dir / "sharked.sample_2.truth.fq"
    ).read_bytes()
    return stats


@pytest.mark.slow
def test_native_pipeline_auto_len(example_dir, tmp_path):
    """Default invocation (no --max-read-len) must take the NATIVE path via
    the auto length scan and stay byte-exact (reference users pass no such
    flag; the reference streams arbitrary lengths, main.cpp:199-233)."""
    stats = _run_native_golden(example_dir, tmp_path, batch_size=2048)
    assert stats["auto_max_read_len"] == 208  # 201 fused, %8 padding


@pytest.mark.slow
def test_native_pipeline_grouped_fetch_golden(example_dir, tmp_path):
    """fetch_group > 1 (grouped d2h verdict fetch: device concat + one
    transfer per group, offset-sliced in the drain) must stay byte-exact,
    including an uneven final group and the CONSUMED ring accounting."""
    stats = _run_native_golden(
        example_dir,
        tmp_path,
        batch_size=512,  # 5000 pairs -> 10 batches; groups of 3 + tail of 1
        max_read_len=208,
        fetch_group=3,
    )
    # prove the grouped path actually engaged: 10 batches in groups of 3
    # flush as 3+3+3+1 — a regression that ignores/clamps fetch_group
    # would still be byte-exact but flush 10 groups
    assert stats["fetch_groups"] == 4


@pytest.mark.slow
def test_native_pipeline_golden(example_dir, tmp_path):
    """Full pipeline through the native engine: byte-exact vs truth files."""
    stats = _run_native_golden(
        example_dir, tmp_path, batch_size=2048, max_read_len=256
    )
    assert stats["n_reads"] == 5000
    assert stats["fetch_groups"] == 3  # 5000/2048 -> 3 groups of 1
    assert stats["probe"] == "hashed"  # auto-select at example scale


@pytest.mark.slow
def test_native_pipeline_classic_probe_golden(example_dir, tmp_path):
    """--probe classic through the FULL native pipeline, byte-exact.

    Auto-select always builds the hashed table at example scale, so the
    two-gather classic layout — the escape hatch a real panel falls back
    to when the hashed table declines, and what --probe classic forces —
    needs its own pipeline-level golden pin (it is otherwise covered only
    at kernel level)."""
    stats = _run_native_golden(
        example_dir, tmp_path, batch_size=2048, max_read_len=208,
        probe="classic",
    )
    assert stats["probe"] == "classic"
    assert stats["n_reads"] == 5000


@pytest.mark.slow
def test_native_pipeline_group_golden(tmp_path):
    """Homolog families through the FULL native pipeline: device GROUP
    verdicts (tie-heavy reads scored as one deduped gene set) expand on
    host and merge with the direct pair stream (_winner_pairs,
    pipeline.py) before flowing through the ORDERED native writer. Pins
    ssv against the pure-host oracle and both FASTQs against the Python
    path, byte-for-byte, and asserts the group path actually engaged.
    Reference emission semantics: ReadAnalyzer.hpp:90-108 +
    ReadOutput.hpp:37-50."""
    from shark_tpu.classify.oracle import build_oracle_index, classify_read
    from shark_tpu.config import SharkConfig
    from shark_tpu.ops.kmers import encode_bytes
    from shark_tpu.pipeline import run_pipeline

    rng = np.random.default_rng(4242)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    k = 15
    genes, cores = [], []
    for fam in range(6):
        core = bases[rng.integers(0, 4, size=150)].tobytes()
        cores.append(core)
        for m in range(5):  # 5 identical cores -> deg-5 tie rows -> GROUP
            flank5 = bases[rng.integers(0, 4, size=80)].tobytes()
            flank3 = bases[rng.integers(0, 4, size=80)].tobytes()
            genes.append((f"F{fam}M{m}", flank5 + core + flank3))
    fa = tmp_path / "fam.fa"
    fa.write_bytes(
        b"".join(b">%s\n%s\n" % (n.encode(), s) for n, s in genes)
    )

    # Interleave read kinds so every batch mixes group verdicts, direct
    # verdicts, impure reads, and unclassified reads through the
    # per-read-offset merge (each read's pairs live in exactly one source).
    reads1, reads2 = [], []
    for i in range(400):
        kind = i % 3
        if kind == 0:  # both mates from one family core: pure group read
            core = cores[int(rng.integers(0, len(cores)))]
            st = int(rng.integers(0, len(core) - 70))
            r1 = core[st : st + 70]
            st = int(rng.integers(0, len(core) - 70))
            r2 = core[st : st + 70]
        elif kind == 1:  # flank window: direct verdict; st>10 also mixes
            _, gseq = genes[int(rng.integers(0, len(genes)))]
            st = int(rng.integers(0, 60))
            r1 = gseq[st : st + 70]
            r2 = gseq[st : st + 70]
        else:  # junk: no verdict
            r1 = bases[rng.integers(0, 4, size=70)].tobytes()
            r2 = bases[rng.integers(0, 4, size=70)].tobytes()
        reads1.append(r1)
        reads2.append(r2)

    def write_fq(path, rs):
        path.write_bytes(
            b"".join(
                b"@r%04d\n%s\n+\n%s\n" % (i, r, b"I" * len(r))
                for i, r in enumerate(rs)
            )
        )

    fq1, fq2 = tmp_path / "s_1.fq", tmp_path / "s_2.fq"
    write_fq(fq1, reads1)
    write_fq(fq2, reads2)

    outs = {}
    for mode in ("native", "python"):
        cfg = SharkConfig(
            fasta_path=str(fa),
            sample1_path=str(fq1),
            sample2_path=str(fq2),
            out1_path=str(tmp_path / f"{mode}.1.fq"),
            out2_path=str(tmp_path / f"{mode}.2.fq"),
            ssv_path=str(tmp_path / f"{mode}.ssv"),
            k=k,
            batch_size=64,  # 7 batches
            max_read_len=144,  # 70 + 1 + 70 fused, %8
            fetch_group=2,  # uneven final flush group
            use_native=(mode == "native"),
        )
        stats = run_pipeline(cfg)
        assert stats.get("native", False) == (mode == "native")
        if mode == "native":
            assert stats["group_rows"] > 50, "group fast path never engaged"
        outs[mode] = {
            "ssv": (tmp_path / f"{mode}.ssv").read_text(),
            "fq1": (tmp_path / f"{mode}.1.fq").read_bytes(),
            "fq2": (tmp_path / f"{mode}.2.fq").read_bytes(),
        }

    cfg0 = SharkConfig()
    oracle = build_oracle_index(genes, k, cfg0.bf_gb * (1 << 33))
    lines = []
    for i, (r1, r2) in enumerate(zip(reads1, reads2)):
        wins, _, _ = classify_read(
            oracle, encode_bytes(r1 + b"N" + r2), cfg0.c, False
        )
        for g in wins:
            lines.append(f"r{i:04d} {genes[g][0]}\n")
    want = "".join(lines)

    assert outs["native"]["ssv"] == want
    assert outs["python"]["ssv"] == want
    assert outs["native"]["fq1"] == outs["python"]["fq1"]
    assert outs["native"]["fq2"] == outs["python"]["fq2"]


def test_set_positions_matches_numpy():
    """Native parallel set-bit scan == the numpy extraction, any thread
    count (exclusive-prefix-popcount slicing makes it deterministic)."""
    rng = np.random.default_rng(7)
    n_words = 1 << 12
    bw = rng.integers(0, 1 << 32, size=n_words, dtype=np.uint64).astype(
        np.uint32
    )
    bw[rng.integers(0, n_words, size=n_words // 2)] = 0  # sparse stretches
    n_set = int(np.bitwise_count(bw).sum()) if hasattr(
        np, "bitwise_count"
    ) else int(bin(int.from_bytes(bw.tobytes(), "little")).count("1"))
    want = []
    for w in range(n_words):
        v = int(bw[w])
        while v:
            b = (v & -v).bit_length() - 1
            want.append((w << 5) | b)
            v &= v - 1
    want = np.array(want, dtype=np.uint64)
    assert want.size == n_set
    for t in (1, 3, 4):
        got = native.set_positions_native(bw, n_set, threads=t)
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError):
        native.set_positions_native(bw, n_set + 1)


def test_pack_xl_native_matches_numpy():
    """shk_pack_xl (native entry streams + bucket fill) must reproduce
    the numpy _pack_table bit for bit — tables, spill rows, and spill
    order — across both entry layouts, tight (spilling) and loose
    geometries, and any thread count."""
    from shark_tpu.classify import hashed as H
    from shark_tpu.classify.step import rows3_payload
    from shark_tpu.index.build import build_index

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    records = []
    for g in range(120):
        seq = bases[rng.integers(0, 4, size=400)].tobytes()
        records.append((f"g{g}", seq))
    # duplicated cores give deg>=2 and deg>=3 entries
    records += [(f"dup{m}", records[0][1][:200]) for m in range(4)]
    ix = build_index(records, 15, 1 << 22)

    pos, tag, payload, has_rows, deg = H._entry_streams(ix)
    assert has_rows  # the dup cores must produce deg>=3 rows
    need = np.where(deg == 1, 1, 2).astype(np.int64)
    d3pay = rows3_payload(ix)

    for lgB, slots, entry16 in (
        (14, 4, True),   # loose: no spills
        (10, 4, True),   # tight: spills
        (14, 8, False),  # entry8 loose
        (9, 8, False),   # entry8 tight
    ):
        t_np, sp_np = H._pack_table(
            pos, tag, payload, need if entry16 else None, lgB, entry16,
            slots,
        )
        for threads in (1, 4):
            res = native.pack_xl_native(
                ix, d3pay, lgB, slots, entry16, spill_cap=1 << 22,
                threads=threads,
            )
            assert res is not None
            t_nat, sp_nat = res
            np.testing.assert_array_equal(t_nat, t_np)
            np.testing.assert_array_equal(sp_nat, sp_np)
    # the spill-cap decline contract
    assert (
        native.pack_xl_native(ix, d3pay, 9, 4, True, spill_cap=1)
        is None
    )

    # full builds (pinned geometry so auto-choice cannot differ) must
    # agree end to end: table, side table, side stash, meta
    nat = H.build_hashed_xl(ix, lgB=15)
    import unittest.mock as mock

    with mock.patch(
        "shark_tpu.io.native.available", return_value=False
    ):
        ref = H.build_hashed_xl(ix, lgB=15)
    assert nat is not None and ref is not None
    for a, b in zip(nat[:3], ref[:3]):
        np.testing.assert_array_equal(a, b)
    assert nat[3] == ref[3]


@pytest.mark.slow
def test_native_pipeline_xl_probe_golden(example_dir, tmp_path):
    """--probe xl through the FULL native pipeline, byte-exact.

    Auto-select picks the hashed table at example scale, so the GB-scale
    one-gather xl layout — what auto picks at transcriptome scale —
    needs its own pipeline-level golden through native parse/emit (it is
    otherwise covered at kernel level by the fuzz suites). At -b 1 the
    forced build lands a ~2^20-bucket 16-byte-row table with the 13-bit
    rest exactly at its lg_min clamp."""
    stats = _run_native_golden(
        example_dir, tmp_path, batch_size=2048, max_read_len=208,
        probe="xl",
    )
    assert stats["probe"] == "xl"
    assert stats["n_reads"] == 5000


def test_pack_xl_corrupt_index_raises():
    """A bit-vector whose popcount disagrees with the CSR metadata must
    raise, not read past the offsets array (same guard class as
    set_positions_native)."""
    from shark_tpu.classify import hashed as H
    from shark_tpu.index.build import build_index

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    recs = [("g", bases[rng.integers(0, 4, 200)].tobytes())]
    ix = build_index(recs, 15, 1 << 16)
    bad = ix.bf_words.copy()
    w = int(np.flatnonzero(bad == 0)[0])
    bad[w] = 1  # extra set bit the CSR knows nothing about
    ix2 = type(ix)(
        k=ix.k, size_bits=ix.size_bits, bf_words=bad,
        word_rank=ix.word_rank, offsets=ix.offsets,
        gene_ids=ix.gene_ids, gene_names=ix.gene_names,
    )
    with pytest.raises(ValueError, match="popcount"):
        native.pack_xl_native(
            ix2, np.zeros(0, np.uint32), 10, 4, True, spill_cap=1 << 16
        )
