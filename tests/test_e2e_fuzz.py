"""Randomized END-TO-END differential fuzz: native engine vs Python path
vs host oracle, byte-for-byte, across paired/single, quality masking, Ns,
CRLF, multi-line FASTA, and odd read lengths.

The existing suite pins each layer separately (parser fuzz, device vs
oracle, golden files); this drives whole random pipelines through both
host engines and checks the ssv against an oracle recomputation — the
same class of evidence as the reference's golden example (README.md:54-69)
but over many random workloads."""

import gzip

import numpy as np
import pytest

from shark_tpu.classify.oracle import build_oracle_index, classify_read
from shark_tpu.config import SharkConfig
from shark_tpu.io import native
from shark_tpu.ops.kmers import encode_bytes
from shark_tpu.pipeline import run_pipeline

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _random_workload(rng, tmp_path, seed):
    k = int(rng.choice([11, 15, 17]))
    n_genes = int(rng.integers(2, 12))
    paired = bool(rng.integers(0, 2))
    minq = int(rng.choice([0, 10]))
    genes = []
    fa_lines = []
    for g in range(n_genes):
        glen = int(rng.integers(k, 400))
        seq = BASES[rng.integers(0, 4, size=glen)].tobytes()
        genes.append((f"g{g}", seq))
        # multi-line records with occasional CRLF
        eol = b"\r\n" if rng.random() < 0.3 else b"\n"
        fa_lines.append(b">g%d%s" % (g, eol))
        for i in range(0, len(seq), 60):
            fa_lines.append(seq[i : i + 60] + eol)
    fa = tmp_path / f"f{seed}.fa"
    fa.write_bytes(b"".join(fa_lines))

    n_reads = int(rng.integers(20, 120))
    reads1, reads2, quals1, quals2 = [], [], [], []
    for i in range(n_reads):
        src, sseq = genes[int(rng.integers(0, n_genes))]
        rlen = int(rng.integers(5, 90))
        if len(sseq) > rlen and rng.random() < 0.8:
            start = int(rng.integers(0, len(sseq) - rlen))
            r = bytearray(sseq[start : start + rlen])
        else:
            r = bytearray(BASES[rng.integers(0, 4, size=rlen)].tobytes())
        # sprinkle Ns and lowercase
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, len(r)))] = ord("N")
        if rng.random() < 0.2:
            r = bytearray(bytes(r).lower())
        q = bytes(
            int(rng.integers(33 + 2, 33 + 40)) for _ in range(len(r))
        )
        reads1.append(bytes(r))
        quals1.append(q)
        if paired:
            r2 = BASES[rng.integers(0, 4, size=rlen)].tobytes()
            reads2.append(r2)
            quals2.append(
                bytes(int(rng.integers(33 + 2, 33 + 40)) for _ in range(rlen))
            )

    def write_fq(path, rs, qs, gz):
        data = b"".join(
            b"@r%04d\n%s\n+\n%s\n" % (i, r, q)
            for i, (r, q) in enumerate(zip(rs, qs))
        )
        if gz:
            with gzip.open(path, "wb") as f:
                f.write(data)
        else:
            path.write_bytes(data)

    gz = bool(rng.integers(0, 2))
    sfx = ".gz" if gz else ""
    fq1 = tmp_path / f"s{seed}_1.fq{sfx}"
    write_fq(fq1, reads1, quals1, gz)
    fq2 = None
    if paired:
        fq2 = tmp_path / f"s{seed}_2.fq{sfx}"
        write_fq(fq2, reads2, quals2, gz)
    return {
        "k": k,
        "minq": minq,
        "paired": paired,
        "genes": genes,
        "fa": fa,
        "fq1": fq1,
        "fq2": fq2,
        "reads1": reads1,
        "reads2": reads2,
        "quals1": quals1,
        "quals2": quals2,
    }


def _oracle_ssv(w):
    """Recompute the expected ssv lines with the pure-host oracle."""
    size_bits = 1 << 33
    oracle = build_oracle_index(w["genes"], w["k"], size_bits)
    lines = []
    for i, r1 in enumerate(w["reads1"]):
        seq = bytearray(r1)
        qual = bytearray(w["quals1"][i])
        if w["paired"]:
            seq += b"N" + w["reads2"][i]
            qual += b"\33" + w["quals2"][i]
        if w["minq"]:
            cut = w["minq"] + 33
            for j in range(min(len(seq), len(qual))):
                if qual[j] < cut:
                    seq[j] = (seq[j] - 64) % 256  # FastqSplitter.hpp:106
        wins, _, _ = classify_read(
            oracle, encode_bytes(bytes(seq)), 0.6, False
        )
        for g in wins:
            lines.append(f"r{i:04d} g{g}\n")
    return "".join(lines)


def run_three_way(tmp_path, seed: int) -> None:
    """ONE fuzz seed's full differential: generate a random workload, run
    three complete pipelines — the native host engine feeding the device
    kernel, the pure-Python I/O path feeding the same kernel, and the
    --backend native pure-CPU C++ classify (shk_host_classify) — and
    assert every output equals the oracle ssv / each other's FASTQs.
    Shared verbatim by the pytest gate below and scripts/fuzz_soak.py so
    the round-closing soak can never certify less than the gate."""
    from pathlib import Path

    tmp_path = Path(tmp_path)
    rng = np.random.default_rng(1000 + seed)
    w = _random_workload(rng, tmp_path, seed)
    want = _oracle_ssv(w)
    # widen probe coverage: random forced layout per seed (auto picks the
    # hashed table at this scale; classic and the GB-scale xl layout must
    # produce the same bytes through both engines)
    probe = str(rng.choice(["auto", "classic", "xl"]))

    outs = {}
    for mode in ("native", "python", "host"):
        cfg = SharkConfig(
            fasta_path=str(w["fa"]),
            sample1_path=str(w["fq1"]),
            sample2_path=str(w["fq2"]) if w["fq2"] else "",
            out1_path=str(tmp_path / f"{mode}{seed}.1.fq"),
            out2_path=str(tmp_path / f"{mode}{seed}.2.fq") if w["fq2"] else "",
            ssv_path=str(tmp_path / f"{mode}{seed}.ssv"),
            k=w["k"],
            min_quality=w["minq"],
            batch_size=32,  # several batches per run
            # fixed geometry: one jit compile per k across all seeds
            # (auto-length would compile per rounded length bucket)
            max_read_len=256,
            use_native=(mode != "python"),
            backend="native" if mode == "host" else "",
            # --probe is a device-layout hint; the host mode prints a
            # note and classifies on the CPU
            probe=probe,
            threads=int(rng.integers(1, 4)) if mode == "host" else 1,
        )
        stats = run_pipeline(cfg)
        assert stats.get("native", False) == (mode != "python")
        if mode == "host":
            assert stats["probe"] == "host"
        elif probe != "auto":
            assert stats["probe"] == probe
        outs[mode] = {
            "ssv": (tmp_path / f"{mode}{seed}.ssv").read_text(),
            "fq1": (tmp_path / f"{mode}{seed}.1.fq").read_bytes(),
            "fq2": (
                (tmp_path / f"{mode}{seed}.2.fq").read_bytes()
                if w["fq2"]
                else b""
            ),
        }

    assert outs["native"]["ssv"] == want
    assert outs["python"]["ssv"] == want
    assert outs["host"]["ssv"] == want
    assert outs["native"]["fq1"] == outs["python"]["fq1"]
    assert outs["native"]["fq2"] == outs["python"]["fq2"]
    assert outs["host"]["fq1"] == outs["native"]["fq1"]
    assert outs["host"]["fq2"] == outs["native"]["fq2"]


@pytest.mark.parametrize(
    "seed",
    [
        # ~15s/seed (two 1 GiB index builds each); keep the fast suite
        # lean and push the deeper sweep to the slow marker
        *range(3),
        *(pytest.param(s, marks=pytest.mark.slow) for s in range(3, 6)),
    ],
)
def test_e2e_differential_fuzz(tmp_path, seed):
    if not native.available():
        pytest.skip("native engine unavailable")
    run_three_way(tmp_path, seed)
