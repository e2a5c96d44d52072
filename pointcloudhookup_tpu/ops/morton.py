"""Morton (Z-order) encoding for spatial keys.

One Morton sort serves every spatial grouping whose cell size is a
power-of-two multiple of the voxel size: cell code = voxel code >> 3k,
so voxel runs AND cell runs are both contiguous after a single sort.
20 bits per axis (104 km at 0.1 m) packed as two int32 words —
lexicographic (hi, lo) order == numeric Morton order, which is what
`lax.sort(num_keys=2)` gives us without int64.
"""

from __future__ import annotations

import jax.numpy as jnp

BITS_PER_AXIS = 20
SENTINEL_HI = jnp.int32(0x7FFFFFFF)  # sorts after every valid code


def _spread10(v):
    """Spread the low 10 bits of v to bits 0,3,6,...,27 (30 bits)."""
    x = v & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _compact10(x):
    """Inverse of _spread10."""
    x = x & 0x09249249
    x = (x | (x >> 2)) & 0x030C30C3
    x = (x | (x >> 4)) & 0x0300F00F
    x = (x | (x >> 8)) & 0x030000FF
    x = (x | (x >> 16)) & 0x3FF
    return x


def morton_encode(ix, iy, iz):
    """20-bit/axis Morton code as (hi, lo) int32 words.

    hi carries bits 30..59 (the high 10 bits of each axis interleaved),
    lo carries bits 0..29.
    """
    ix = jnp.clip(ix, 0, (1 << BITS_PER_AXIS) - 1).astype(jnp.int32)
    iy = jnp.clip(iy, 0, (1 << BITS_PER_AXIS) - 1).astype(jnp.int32)
    iz = jnp.clip(iz, 0, (1 << BITS_PER_AXIS) - 1).astype(jnp.int32)
    lo = _spread10(ix) | (_spread10(iy) << 1) | (_spread10(iz) << 2)
    hi = (
        _spread10(ix >> 10)
        | (_spread10(iy >> 10) << 1)
        | (_spread10(iz >> 10) << 2)
    )
    return hi, lo


def morton_decode(hi, lo):
    """(hi, lo) -> (ix, iy, iz)."""
    ix = _compact10(lo) | (_compact10(hi) << 10)
    iy = _compact10(lo >> 1) | (_compact10(hi >> 1) << 10)
    iz = _compact10(lo >> 2) | (_compact10(hi >> 2) << 10)
    return ix, iy, iz


def shift_code(hi, lo, shift3k: int):
    """Right-shift a 60-bit (hi, lo) code by shift3k bits (coarser grid).
    Requires shift3k <= 30."""
    if shift3k == 0:
        return hi, lo
    if shift3k > 30:
        raise ValueError("shift must be <= 30")
    low_bits_of_hi = hi & ((1 << shift3k) - 1)
    lo_shifted = (lo >> shift3k) | (low_bits_of_hi << (30 - shift3k))
    hi_shifted = hi >> shift3k
    return hi_shifted, lo_shifted


def interleave_tight(ix, iy, iz, bits: tuple):
    """Tight Morton-style interleave with STATIC per-axis bit widths.

    Standard 20-bit/axis interleaving wastes key range on a flat tile:
    a corridor with an 11-bit z span still reserves bit positions for
    z levels 11..19, inflating the cell-level code past 32 bits.  This
    variant assigns positions round-robin over only the axes that still
    have bits at each level, so the result occupies exactly
    sum(bits) bits: injective on [0,2^bx) x [0,2^by) x [0,2^bz) and
    hierarchy-preserving (equal high levels <=> same coarse cell), which
    is all the single-key cell sort needs (grouping + spatial locality;
    the exact lexicographic order between cells is immaterial).

    bits must be a static (bx, by, bz) with sum(bits) <= 32.  Values are
    masked to their widths (callers guarantee ranges via the tile span).
    """
    bx, by, bz = bits
    if bx + by + bz > 32:
        raise ValueError(f"sum(bits)={bx + by + bz} exceeds 32")
    out = None
    p = 0
    for lvl in range(max(bits)):
        for v, b in ((ix, bx), (iy, by), (iz, bz)):
            if lvl < b:
                bit = ((v >> lvl) & 1).astype(jnp.uint32) << p
                out = bit if out is None else out | bit
                p += 1
    if out is None:
        return jnp.zeros_like(ix, dtype=jnp.uint32)
    return out
