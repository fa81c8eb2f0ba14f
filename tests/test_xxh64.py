import numpy as np

from shark_tpu.ops import u64
from shark_tpu.ops.xxh64 import xxh64_int, xxh64_np, xxh64_u64

# Known-answer vectors generated from the reference implementation
# (xxh::xxhash<64>(&key, 8, 0), reference: xxhash.hpp:495-500).
VECTORS = [
    (0x0000000000000000, 0x34C96ACDCADB1BBB),
    (0x0000000000000001, 0x9F29CB17A2A49995),
    (0xFFFFFFFFFFFFFFFF, 0x85D136ADB773C6C9),
    (0x0123456789ABCDEF, 0xEA3C52081E9843EC),
    (0xDEADBEEFCAFEBABE, 0x71B945FC6AA78825),
    (0x0000000000000011, 0xA5CD976DCBFDD418),
    (0x5555555555555555, 0x2BFFB3F5EFD81D61),
    (0xAAAAAAAAAAAAAAAA, 0x8F97333655308079),
    (0x112210F47DE98115, 0x9ABC16E677108D4A),
    (0x4000000000000000, 0x88804A4927A4014B),
    (0x2545F4914F6CDD1D, 0xFA18BC80ABA6E2F2),
]


def test_known_answers_python():
    for key, want in VECTORS:
        assert xxh64_int(key) == want


def test_known_answers_numpy():
    keys = np.array([k for k, _ in VECTORS], dtype=np.uint64)
    want = np.array([h for _, h in VECTORS], dtype=np.uint64)
    np.testing.assert_array_equal(xxh64_np(keys), want)


def test_known_answers_jax_limbs():
    for key, want in VECTORS:
        got = u64.to_py(xxh64_u64(u64.from_py(key)))
        assert got == want, hex(key)


def test_jax_matches_numpy_random():
    rng = np.random.default_rng(42)
    keys = rng.integers(0, (1 << 64) - 1, size=4096, dtype=np.uint64)
    want = xxh64_np(keys)
    import jax.numpy as jnp

    hi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    got_hi, got_lo = xxh64_u64((hi, lo))
    got = (np.asarray(got_hi, np.uint64) << np.uint64(32)) | np.asarray(
        got_lo, np.uint64
    )
    np.testing.assert_array_equal(got, want)
