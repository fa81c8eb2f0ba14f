"""Fuzz the native parser against the Python parser on generated corpora
(multi-line records, CRLF, gzip, odd quality bytes, empty lines)."""

import gzip

import numpy as np
import pytest

from shark_tpu.io import native
from shark_tpu.io.encode import encode_batch
from shark_tpu.io.fastx import read_fastq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)


def _mk_fastq(rng, n_reads, multiline=False, crlf=False):
    eol = b"\r\n" if crlf else b"\n"
    out = []
    lens = []
    for i in range(n_reads):
        ln = int(rng.integers(1, 180))
        lens.append(ln)
        seq = rng.choice(
            np.frombuffer(b"ACGTNacgtn", np.uint8), size=ln
        ).tobytes()
        qual = rng.integers(33, 74, size=ln, dtype=np.uint8).tobytes()
        name = f"read{i} extra comment".encode()
        out.append(b"@" + name + eol)
        if multiline and ln > 20:
            cut = ln // 2
            out.append(seq[:cut] + eol + seq[cut:] + eol)
            out.append(b"+" + eol)
            out.append(qual[:cut] + eol + qual[cut:] + eol)
        else:
            out.append(seq + eol + b"+" + eol + qual + eol)
    return b"".join(out), lens


@pytest.mark.parametrize("multiline", [False, True])
@pytest.mark.parametrize("crlf", [False, True])
@pytest.mark.parametrize("gz", [False, True])
def test_native_parser_matches_python(tmp_path, multiline, crlf, gz):
    rng = np.random.default_rng(hash((multiline, crlf, gz)) % (2**31))
    data, _ = _mk_fastq(rng, 157, multiline=multiline, crlf=crlf)
    path = tmp_path / ("f.fq.gz" if gz else "f.fq")
    path.write_bytes(gzip.compress(data) if gz else data)

    py_recs = list(read_fastq(str(path)))
    assert len(py_recs) == 157

    B, L = 64, 256
    ns = native.NativeStream(str(path), "", B, L, 5)
    it = iter(py_recs)
    total = 0
    while (nb := ns.next_batch()) is not None:
        codes, slot, n = nb
        recs = [next(it) for _ in range(n)]
        ref = encode_batch(recs, None, 5, B, L)
        np.testing.assert_array_equal(codes[:n], ref.codes[:n])
        total += n
        ns.release(slot)
    assert total == 157
    ns.close()


def test_native_parser_truncated_gzip(tmp_path):
    """A truncated gzip MUST surface as an error, never as a clean EOF —
    even when the decodable prefix happens to end at a record boundary
    (zlib reports the final gzread as 0, not -1, with errnum Z_BUF_ERROR;
    a silent stop would report a truncated run as success). The Python
    parser raises for the same input (gzip.EOFError)."""
    rng = np.random.default_rng(3)
    data, _ = _mk_fastq(rng, 200)
    blob = gzip.compress(data)
    path = tmp_path / "trunc.fq.gz"
    path.write_bytes(blob[: len(blob) // 2])
    ns = native.NativeStream(str(path), "", 64, 256, 0)
    total = 0
    with pytest.raises(ValueError, match="truncated or corrupt|malformed"):
        while (nb := ns.next_batch()) is not None:
            total += nb[2]
            ns.release(nb[1])
    ns.close()
    assert total <= 200  # parsed some prefix, no crash

    # the Python path raises for the same input (parity of failure modes)
    with pytest.raises((EOFError, OSError, ValueError)):
        list(read_fastq(str(path)))


def test_native_build_truncated_gzip(tmp_path):
    """An index must never be silently built from a truncated gzip FASTA
    (it would classify against a partial gene set and report success)."""
    rng = np.random.default_rng(4)
    genes = []
    for i in range(50):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=400).tobytes()
        genes.append(b">gene%d\n" % i + seq + b"\n")
    blob = gzip.compress(b"".join(genes))
    path = tmp_path / "ref.fa.gz"
    path.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="truncated or corrupt"):
        native.build_index_native(str(path), 17, 1 << 14)


def _mk_fastx(rng, n_reads, crlf=False, fasta_frac=0.5):
    """Mixed FASTA/FASTQ sample records, kseq-style (FASTA ones have no
    qual and may span lines)."""
    eol = b"\r\n" if crlf else b"\n"
    out = []
    kinds = []
    for i in range(n_reads):
        ln = int(rng.integers(1, 180))
        seq = rng.choice(
            np.frombuffer(b"ACGTNacgtn", np.uint8), size=ln
        ).tobytes()
        name = f"rec{i} comment".encode()
        if rng.random() < fasta_frac:
            kinds.append("fasta")
            out.append(b">" + name + eol)
            if ln > 20:
                cut = ln // 3
                out.append(seq[:cut] + eol + seq[cut:] + eol)
            else:
                out.append(seq + eol)
        else:
            kinds.append("fastq")
            qual = rng.integers(33, 74, size=ln, dtype=np.uint8).tobytes()
            out.append(b"@" + name + eol)
            out.append(seq + eol + b"+" + eol + qual + eol)
    return b"".join(out), kinds


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("minq", [0, 20])
def test_fasta_sample_native_matches_python(tmp_path, gz, minq):
    """FASTA (and mixed FASTA/FASTQ) sample records parse identically in
    the native and Python paths — kseq parity (reference kseq.h:177-218:
    FastqSplitter runs on kseq, which accepts either format; FASTA
    records carry an empty qual so q>0 masks nothing on single-end)."""
    rng = np.random.default_rng(99 + gz + minq)
    data, kinds = _mk_fastx(rng, 143, fasta_frac=0.6)
    path = tmp_path / ("m.fq.gz" if gz else "m.fq")
    path.write_bytes(gzip.compress(data) if gz else data)

    py_recs = list(read_fastq(str(path)))
    assert len(py_recs) == 143
    assert any(q == b"" for _, _, q in py_recs)  # FASTA records present

    B, L = 64, 256
    ns = native.NativeStream(str(path), "", B, L, minq)
    it = iter(py_recs)
    total = 0
    while (nb := ns.next_batch()) is not None:
        codes, slot, n = nb
        recs = [next(it) for _ in range(n)]
        ref = encode_batch(recs, None, minq, B, L)
        np.testing.assert_array_equal(codes[:n], ref.codes[:n])
        total += n
        ns.release(slot)
    assert total == 143
    ns.close()


def test_paired_fasta_fused_qual_quirk(tmp_path):
    """Reference quirk (FastqSplitter.hpp:84-90): pairs mask over the FUSED
    qual = qual1 + '\\33' + qual2 in qual coordinates. With FASTA mate 1
    (empty qual) and q>0, fused position 0 is the junction byte and mate-2
    qualities mask positions 1..len(q2) — i.e. INSIDE seq1."""
    f1 = tmp_path / "m1.fa"
    f2 = tmp_path / "m2.fq"
    f1.write_bytes(b">p1\nACGTACGT\n")
    f2.write_bytes(b"@p1\nGGGG\n+\nI!II\n")  # '!' = low qual at q2[1]
    py = encode_batch(
        [("p1", b"ACGTACGT", b"")],
        [("p1", b"GGGG", b"I!II")],
        10,
        4,
        32,
    )
    # fused seq coords: ACGTACGT . GGGG ; fused qual = "" + '\33' + "I!II"
    # masks fused positions 0 (junction byte) and 2 (the '!')
    want = np.full(32, 4, dtype=np.uint8)
    want[:8] = [4, 1, 4, 3, 0, 1, 2, 3]  # A,G masked at 0 and 2
    want[9:13] = 2  # GGGG after the separator column
    np.testing.assert_array_equal(py.codes[0], want)

    ns = native.NativeStream(str(f1), str(f2), 4, 32, 10)
    codes, slot, n = ns.next_batch()
    assert n == 1
    np.testing.assert_array_equal(codes[0], want)
    ns.close()


@pytest.mark.parametrize(
    "blob",
    [
        b"@r1\nACGT\n+\nIII\n",  # qual shorter than seq
        b"@r1\nACGT\n+\nIIIII\n@r2\nAC\n+\nII\n",  # qual longer than seq
        b"@r1\nACGT\nIIII\n",  # missing '+' separator line
    ],
    ids=["qual-short", "qual-long", "no-plus"],
)
def test_malformed_record_rejected_by_both_parsers(tmp_path, blob):
    """Native and Python parsers must agree on REJECTION too: a malformed
    record raises (never a silent truncation reported as success — the
    reference's kseq returns -2 for a qual/seq mismatch, kseq.h:214-216)."""
    path = tmp_path / "bad.fq"
    path.write_bytes(b"@ok\nACGT\n+\nIIII\n" + blob)

    with pytest.raises(ValueError):
        list(read_fastq(str(path)))

    ns = native.NativeStream(str(path), "", 16, 64, 0)
    with pytest.raises(ValueError, match="malformed"):
        total = 0
        while (nb := ns.next_batch()) is not None:
            total += nb[-1]
            ns.release(nb[1])
    ns.close()


def test_native_parser_empty_file(tmp_path):
    path = tmp_path / "empty.fq"
    path.write_bytes(b"")
    ns = native.NativeStream(str(path), "", 16, 64, 0)
    assert ns.next_batch() is None
    ns.close()
