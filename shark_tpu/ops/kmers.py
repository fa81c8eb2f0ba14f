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
    """
    B, L = codes.shape
    valid = codes < INVALID
    c = jnp.where(valid, codes, 0).astype(jnp.uint32)

    # x_j[b, e] = code at window offset j for the window ending at e,
    # i.e. codes[b, e - (k-1) + j]; realized as a right-shift of the row.
    def shifted(arr, offset):
        # arr shifted right by `offset` along axis 1 (zero/False fill)
        if offset == 0:
            return arr
        pad = jnp.zeros((B, offset), dtype=arr.dtype)
        return jnp.concatenate([pad, arr[:, : L - offset]], axis=1)

    fwd = u64.from_u32(jnp.zeros((B, L), jnp.uint32))
    rc = u64.from_u32(jnp.zeros((B, L), jnp.uint32))
    win_valid = jnp.ones((B, L), dtype=bool)
    top = 2 * k - 2
    for j in range(k):
        off = k - 1 - j
        cj = shifted(c, off)
        vj = shifted(valid, off)
        fwd = u64.or_(u64.shli(fwd, 2), u64.from_u32(cj))
        comp = (cj ^ 3).astype(jnp.uint32)
        rc = u64.or_(u64.shri(rc, 2), u64.shli(u64.from_u32(comp), top))
        win_valid = win_valid & vj
    # windows ending before k-1 are out of range
    pos = jax_iota_row(B, L)
    win_valid = win_valid & (pos >= (k - 1))
    canon = u64.min_(fwd, rc)
    return canon, win_valid


def jax_iota_row(B: int, L: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
