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
    """Corrupt gzip must terminate cleanly (no crash / OOB read)."""
    rng = np.random.default_rng(3)
    data, _ = _mk_fastq(rng, 200)
    blob = gzip.compress(data)
    path = tmp_path / "trunc.fq.gz"
    path.write_bytes(blob[: len(blob) // 2])
    ns = native.NativeStream(str(path), "", 64, 256, 0)
    total = 0
    while (nb := ns.next_batch()) is not None:
        total += nb[2]
        ns.release(nb[1])
    ns.close()
    assert total <= 200  # parsed some prefix, no crash


def test_native_parser_empty_file(tmp_path):
    path = tmp_path / "empty.fq"
    path.write_bytes(b"")
    ns = native.NativeStream(str(path), "", 16, 64, 0)
    assert ns.next_batch() is None
    ns.close()
