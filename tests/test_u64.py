import jax.numpy as jnp
import numpy as np

from shark_tpu.ops import u64

MASK = (1 << 64) - 1

rng = np.random.default_rng(0)
EDGE = np.array(
    [
        0,
        1,
        0xFFFFFFFF,
        0x100000000,
        MASK,
        0x0123456789ABCDEF,
        0xDEADBEEFCAFEBABE,
    ],
    dtype=np.uint64,
)
XS = np.concatenate([EDGE, rng.integers(0, MASK, size=64, dtype=np.uint64)])
YS = np.concatenate([EDGE[::-1], rng.integers(0, MASK, size=64, dtype=np.uint64)])


def to_limbs(x: np.ndarray) -> u64.U64:
    return (
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def from_limbs(a: u64.U64) -> np.ndarray:
    return (np.asarray(a[0], np.uint64) << np.uint64(32)) | np.asarray(
        a[1], np.uint64
    )


A = to_limbs(XS)
B = to_limbs(YS)


def test_add():
    np.testing.assert_array_equal(from_limbs(u64.add(A, B)), XS + YS)


def test_mul():
    np.testing.assert_array_equal(from_limbs(u64.mul(A, B)), XS * YS)


def test_bitwise():
    np.testing.assert_array_equal(from_limbs(u64.xor(A, B)), XS ^ YS)
    np.testing.assert_array_equal(from_limbs(u64.or_(A, B)), XS | YS)
    np.testing.assert_array_equal(from_limbs(u64.and_(A, B)), XS & YS)


def test_shifts_and_rotl():
    for s in [0, 1, 2, 5, 31, 32, 33, 62, 63]:
        np.testing.assert_array_equal(
            from_limbs(u64.shli(A, s)), XS << np.uint64(s)
        )
        np.testing.assert_array_equal(
            from_limbs(u64.shri(A, s)), XS >> np.uint64(s)
        )
        if s:
            want = (XS << np.uint64(s)) | (XS >> np.uint64(64 - s))
            np.testing.assert_array_equal(from_limbs(u64.rotli(A, s)), want)


def test_cmp_min_select():
    np.testing.assert_array_equal(np.asarray(u64.lt(A, B)), XS < YS)
    np.testing.assert_array_equal(np.asarray(u64.eq(A, A)), np.ones_like(XS, bool))
    np.testing.assert_array_equal(from_limbs(u64.min_(A, B)), np.minimum(XS, YS))


def test_from_py_roundtrip():
    for v in [0, 1, MASK, 0x0123456789ABCDEF]:
        assert u64.to_py(u64.from_py(v)) == v
