"""Canonical k-mer extraction.

Base encoding: A/a=0, C/c=1, G/g=2, T/t=3, anything else = INVALID (4).
(The reference keeps a 1-based table and subtracts 1 at use sites,
kmer_utils.hpp:29-41 and KmerBuilder.hpp:61; we encode 0-based directly.)

A k-mer is any length-k window of consecutive valid bases; its packed value
places the leftmost base in the most-significant 2 bits (reference
build_kmer/lsappend, kmer_utils.hpp:57-75). The canonical form is
min(kmer, revcomp(kmer)) as 2k-bit integers. The reference's rebuild-after-
invalid-char rolling scan (KmerBuilder.hpp:52-67) enumerates exactly the set
of all-valid windows in left-to-right order; we compute all windows in
parallel and mask, which yields the identical multiset with end positions.

Host (numpy uint64) and device (uint32 limb pairs) implementations.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from shark_tpu.ops import u64

INVALID = 4

# byte -> code lookup table (0..3 bases, 4 otherwise), covering 0..255
BYTE_TO_CODE = np.full(256, INVALID, dtype=np.uint8)
for _ch, _code in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    BYTE_TO_CODE[ord(_ch)] = _code
    BYTE_TO_CODE[ord(_ch.lower())] = _code


def encode_bytes(seq: bytes) -> np.ndarray:
    """ASCII sequence -> uint8 codes (0..3, INVALID)."""
    return BYTE_TO_CODE[np.frombuffer(seq, dtype=np.uint8)]


# ---------------------------------------------------------------------------
# Host path (numpy, native uint64)
# ---------------------------------------------------------------------------


def canonical_kmers_np(codes: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """All-window canonical k-mers of one 1-D code array.

    Returns (canon, end_pos): uint64 canonical values and int64 end positions
    (index of the window's last base) for each *valid* window, in increasing
    end-position order — the same order as the reference's rolling scan.
    """
    codes = np.asarray(codes, dtype=np.uint8)
    n = codes.shape[0]
    if n < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    valid = codes != INVALID
    c = np.where(valid, codes, 0).astype(np.uint64)
    nwin = n - k + 1
    fwd = np.zeros(nwin, dtype=np.uint64)
    rc = np.zeros(nwin, dtype=np.uint64)
    allvalid = np.ones(nwin, dtype=bool)
    top = np.uint64(2 * k - 2)
    for j in range(k):
        cj = c[j : j + nwin]
        fwd = (fwd << np.uint64(2)) | cj
        rc = (rc >> np.uint64(2)) | ((np.uint64(3) ^ cj) << top)
        allvalid &= valid[j : j + nwin]
    canon = np.minimum(fwd, rc)
    end_pos = np.nonzero(allvalid)[0] + (k - 1)
    return canon[allvalid], end_pos


# ---------------------------------------------------------------------------
# Device path (JAX, uint32 limb pairs) — batched [B, L]
# ---------------------------------------------------------------------------


def canonical_kmers_jax(
    codes: jnp.ndarray, k: int
) -> Tuple[u64.U64, jnp.ndarray]:
    """Canonical k-mers for every window of a padded batch.

    codes: uint8/int32 [B, L] (values 0..3 valid, >=4 invalid/padding).
    Returns (canon, window_valid): canon is a uint32-limb pair of shape
    [B, L] where index e corresponds to the window *ending* at position e
    (entries with e < k-1 or any invalid base are masked False).

    Built by logarithmic doubling rather than a k-step rolling chain: a
    window of length m+n ending at e is the length-m window ending at
    e-n packed above the length-n window ending at e (and the reverse
    complement composes the opposite way). This keeps the op-graph depth
    at O(log k) — both faster and *vastly* cheaper to compile than the
    reference's per-base rolling recurrence (kmer_utils.hpp:73-79), which
    XLA would otherwise unroll into a k-deep dependency chain.
    """
    B, L = codes.shape
    valid = codes < INVALID
    c = jnp.where(valid, codes, 0).astype(jnp.uint32)

    def shifted(arr, offset):
        # arr[b, i] -> arr[b, i-offset] (zero-fill on the left edge)
        if offset == 0:
            return arr
        pad = jnp.zeros((B, offset), dtype=arr.dtype)
        return jnp.concatenate([pad, arr[:, : L - offset]], axis=1)

    def combine(a, b, m: int, n: int):
        """Windows (fwd, rc, valid) of length m+n ending at e, from the
        length-m window ending at e-n and the length-n window ending at e."""
        fa, ra, va = a
        fb, rb, vb = b
        fa_s = (shifted(fa[0], n), shifted(fa[1], n))
        ra_s = (shifted(ra[0], n), shifted(ra[1], n))
        va_s = shifted(va, n)
        fwd = u64.or_(u64.shli(fa_s, 2 * n), fb)
        rc = u64.or_(u64.shli(rb, 2 * m), ra_s)
        return fwd, rc, va_s & vb

    # length-1 windows
    base = (
        u64.from_u32(c),
        u64.from_u32((c ^ 3).astype(jnp.uint32)),
        valid,
    )
    # doubled[s] = windows of length 2**s
    pieces = {1: base}
    m = 1
    cur = base
    while m * 2 <= k:
        cur = combine(cur, cur, m, m)
        m *= 2
        pieces[m] = cur
    # compose k from its binary decomposition, largest piece first
    rem = k - m
    acc = cur
    acc_len = m
    while rem:
        p = 1 << (rem.bit_length() - 1)
        acc = combine(acc, pieces[p], acc_len, p)
        acc_len += p
        rem -= p

    fwd, rc, win_valid = acc
    pos = jax_iota_row(B, L)
    win_valid = win_valid & (pos >= (k - 1))
    canon = u64.min_(fwd, rc)
    return canon, win_valid


def jax_iota_row(B: int, L: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
