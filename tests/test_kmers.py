import jax.numpy as jnp
import numpy as np

from shark_tpu.ops import u64
from shark_tpu.ops.kmers import (
    INVALID,
    canonical_kmers_jax,
    canonical_kmers_np,
    encode_bytes,
)

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp_str(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def pack(s: str) -> int:
    v = 0
    for ch in s:
        v = (v << 2) | "ACGT".index(ch)
    return v


def oracle_windows(seq: str, k: int):
    """Brute-force canonical k-mers of all valid windows."""
    out = []
    for e in range(k - 1, len(seq)):
        w = seq[e - k + 1 : e + 1]
        if all(ch in "ACGT" for ch in w.upper()):
            wu = w.upper()
            out.append((min(pack(wu), pack(revcomp_str(wu))), e))
    return out


def test_encode():
    codes = encode_bytes(b"ACGTacgtNnX-")
    np.testing.assert_array_equal(
        codes, [0, 1, 2, 3, 0, 1, 2, 3, INVALID, INVALID, INVALID, INVALID]
    )


def test_host_windows_match_bruteforce():
    rng = np.random.default_rng(7)
    for k in [3, 5, 17, 31]:
        for _ in range(10):
            n = int(rng.integers(k - 1, 80))
            seq = "".join(rng.choice(list("ACGTN"), p=[0.23, 0.23, 0.23, 0.23, 0.08], size=n))
            canon, pos = canonical_kmers_np(encode_bytes(seq.encode()), k)
            want = oracle_windows(seq, k)
            got = list(zip(canon.tolist(), pos.tolist()))
            assert got == want, (k, seq)


def test_jax_matches_host():
    rng = np.random.default_rng(11)
    B, L = 16, 96
    for k in (1, 2, 5, 17, 24, 31):
        rows = []
        for _ in range(B):
            seq = rng.choice(
                np.frombuffer(b"ACGTN", np.uint8),
                size=L,
                p=[0.24, 0.24, 0.24, 0.24, 0.04],
            )
            rows.append(seq)
        seqs = np.stack(rows)
        codes = encode_bytes(seqs.tobytes()).reshape(B, L)
        canon, valid = canonical_kmers_jax(jnp.asarray(codes), k)
        canon_np = (
            np.asarray(canon[0], np.uint64) << np.uint64(32)
        ) | np.asarray(canon[1], np.uint64)
        valid = np.asarray(valid)
        for b in range(B):
            want_canon, want_pos = canonical_kmers_np(codes[b], k)
            got_pos = np.nonzero(valid[b])[0]
            np.testing.assert_array_equal(got_pos, want_pos, err_msg=f"k={k}")
            np.testing.assert_array_equal(canon_np[b][got_pos], want_canon)


def test_revcomp_involution_property():
    rng = np.random.default_rng(3)
    k = 21
    seq = "".join(rng.choice(list("ACGT"), size=60))
    rc = revcomp_str(seq)
    canon1, _ = canonical_kmers_np(encode_bytes(seq.encode()), k)
    canon2, _ = canonical_kmers_np(encode_bytes(rc.encode()), k)
    assert sorted(canon1.tolist()) == sorted(canon2.tolist())
