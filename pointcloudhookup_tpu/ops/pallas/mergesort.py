"""Two-level merge sort for the fused frontend's 2-word Morton sort.

lax.sort cost on TPU falls super-linearly with the sort length: at 4M
rows a flat 2-key sort costs ~12 ms while the same data as [512, 8192]
batched minor-dim sorts costs ~4.5 ms (scripts/profile_sort_shapes.py).
This module recovers the GLOBAL order from the cheap blocked sort with
log2(N/B) merge-path rounds, each one streaming Pallas pass:

  phase 1   lax.sort of [N/B, B] blocks (XLA batched sort, 2 keys)
  round r   merge sorted runs of length L = B*2^r pairwise: the output
            is cut into B-element tiles; a vectorized merge-path binary
            search (co-ranks) finds, per tile, the window of each input
            run feeding it; the kernel loads both windows, masks them
            with +inf beyond their real lengths (la + lb = T), takes
            elementwise lexmins of window A vs reversed window B (the
            bitonic separator: the T smallest of the 2T slots), and
            cleans the result with a log2(T)-stage bitonic network in
            VMEM.  One HBM read of ~2T per side + one T write per tile.

The sort is EXACT (full 60-bit lexicographic order, identical arrays
to lax.sort((hi, lo), num_keys=2) — the pair is the whole record, so
stability is moot) for any non-negative int32 (hi, lo).  Masked rows
carrying (SENTINEL_HI, *) sort to the tail exactly as with lax.sort.

Requires N a power of two with N >= 2*block; callers fall back to
lax.sort otherwise (merge_sort_eligible).

Replaces: the dominant stage of ops/frontend_fused.py (reference
workload: /root/reference/utils/tower_extraction.py:96-122's chunked
DBSCAN, whose TPU-native equivalent needs globally Morton-sorted rows).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAXI = 0x7FFFFFFF  # == morton.SENTINEL_HI


def merge_sort_eligible(n: int, block: int = 8192) -> bool:
    """True when merge_sort_2key supports length n (pow2, >= 2 blocks)."""
    return n >= 2 * block and (n & (n - 1)) == 0


def _lex_le(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


# ---------------------------------------------------------------- host side


def _partitions(hi, lo, L: int, T: int, n: int):
    """Merge-path co-ranks for every output tile boundary of one round.

    Runs of length L are merged pairwise; output tile t covers global
    rows [t*T, (t+1)*T).  For its start boundary b (local to the pair)
    find the max i with A[i-1] <=lex B[b-i]: the tile consumes
    A[i : i+la) and B[b-i : b-i+lb) with la from the NEXT boundary's i
    and la + lb = T.  Returns per-tile (blkA, cA, la, blkB, cB, lb),
    each [nb+1] i32 (the +1 entry feeds the sentinel-pad tile), where
    blk* are T-element block indices into the PADDED array and c* the
    in-window offsets (< T).
    """
    nb = n // T
    t = jnp.arange(nb, dtype=jnp.int32)
    g = t * T
    pair = g // (2 * L)
    b = g - pair * (2 * L)
    astart = pair * (2 * L)
    bstart = astart + L

    def pred(i):
        ai = jnp.clip(astart + i - 1, 0, n - 1)
        bj = jnp.clip(bstart + b - i, 0, n - 1)
        le = _lex_le(hi[ai], lo[ai], hi[bj], lo[bj])
        return (i <= 0) | ((b - i) >= L) | le

    lo_i = jnp.maximum(b - L, 0)
    hi_i = jnp.minimum(b, L)
    steps = int(math.log2(L)) + 1

    def body(_, carry):
        lo_, hi_ = carry
        mid = lo_ + (hi_ - lo_ + 1) // 2
        p = pred(mid)
        return jnp.where(p, mid, lo_), jnp.where(p, hi_, mid - 1)

    i0, _ = lax.fori_loop(0, steps, body, (lo_i, hi_i))

    i_next = jnp.where(
        (b + T) % (2 * L) == 0,
        jnp.int32(L),
        jnp.concatenate([i0[1:], jnp.zeros(1, jnp.int32)]),
    )
    la = i_next - i0
    lb = T - la
    iA0 = astart + i0
    jB0 = bstart + (b - i0)

    def blkc(start, ln):
        # ln == 0 windows are fully masked; point them at block 0 so
        # blk+1 stays a valid padded-array block even when start == n
        blk = jnp.where(ln > 0, start // T, 0).astype(jnp.int32)
        c = jnp.where(ln > 0, start - blk * T, 0).astype(jnp.int32)
        return blk, c

    blkA, cA = blkc(iA0, la)
    blkB, cB = blkc(jB0, lb)

    def pad1(x):
        return jnp.concatenate([x, jnp.zeros(1, jnp.int32)])

    return tuple(map(pad1, (blkA, cA, la, blkB, cB, lb)))


# -------------------------------------------------------------- kernel side


def _extract(W, c, R: int):
    """T = R*128 contiguous elements starting at flat offset c (< T)
    of the [2R, 128] window W, as [R, 128] (row-major flat order)."""
    r0 = c // _LANES
    cl = c % _LANES
    # Mosaic has no dynamic_slice on values; a dynamic row roll + a
    # static slice is equivalent (r0 < R, so rows [0, R+1) suffice)
    two_r = 2 * R
    Wa = pltpu.roll(W, shift=(two_r - r0) % two_r, axis=0)[: R + 1]
    # V[r, l] = Wa[r, (l + cl) % 128]
    V = pltpu.roll(Wa, shift=(_LANES - cl) % _LANES, axis=1)
    Vn = pltpu.roll(V, shift=R, axis=0)  # V[(r + 1) % (R + 1)]
    lane = lax.broadcasted_iota(jnp.int32, (R + 1, _LANES), 1)
    y = jnp.where(lane < _LANES - cl, V, Vn)
    return y[:R]


def _flat_reverse(x, R: int):
    """x viewed as a flat [R*128] array, reversed (index XOR'd with
    R*128-1 via per-bit unconditional exchanges — no rev primitive)."""
    row = lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    d = R >> 1
    while d >= 1:
        plus = pltpu.roll(x, shift=R - d, axis=0)
        minus = pltpu.roll(x, shift=d, axis=0)
        x = jnp.where((row & d) == 0, plus, minus)
        d >>= 1
    d = _LANES >> 1
    while d >= 1:
        plus = pltpu.roll(x, shift=_LANES - d, axis=1)
        minus = pltpu.roll(x, shift=d, axis=1)
        x = jnp.where((lane & d) == 0, plus, minus)
        d >>= 1
    return x


def _ce_stage(ah, al, d: int, R: int):
    """Ascending bitonic compare-exchange at flat distance d on the
    2-word keys (ah, al) laid out [R, 128] row-major."""
    if d >= _LANES:
        dd, size, axis = d // _LANES, R, 0
        idx = lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    else:
        dd, size, axis = d, _LANES, 1
        idx = lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    lower = (idx & dd) == 0

    def partner(x):
        plus = pltpu.roll(x, shift=size - dd, axis=axis)
        minus = pltpu.roll(x, shift=dd, axis=axis)
        return jnp.where(lower, plus, minus)

    ph = partner(ah)
    plo = partner(al)
    le = _lex_le(ah, al, ph, plo)
    keep_self = lower == le
    return jnp.where(keep_self, ah, ph), jnp.where(keep_self, al, plo)


def _merge_kernel(
    sblkA, scA, sla, sblkB, scB, slb,
    hiA0, hiA1, loA0, loA1, hiB0, hiB1, loB0, loB1,
    out_hi, out_lo, *, R: int,
):
    t = pl.program_id(0)
    nb = pl.num_programs(0) - 1
    maxi = jnp.int32(_MAXI)

    @pl.when(t == nb)
    def _():
        out_hi[:] = jnp.full((R, _LANES), maxi, jnp.int32)
        out_lo[:] = jnp.full((R, _LANES), maxi, jnp.int32)

    @pl.when(t < nb)
    def _():
        cA = scA[t]
        la = sla[t]
        cB = scB[t]
        lb = slb[t]
        flat = (
            lax.broadcasted_iota(jnp.int32, (R, _LANES), 0) * _LANES
            + lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
        )
        WhA = jnp.concatenate([hiA0[:], hiA1[:]], axis=0)
        WlA = jnp.concatenate([loA0[:], loA1[:]], axis=0)
        yAh = _extract(WhA, cA, R)
        yAl = _extract(WlA, cA, R)
        mA = flat < la
        yAh = jnp.where(mA, yAh, maxi)
        yAl = jnp.where(mA, yAl, maxi)
        WhB = jnp.concatenate([hiB0[:], hiB1[:]], axis=0)
        WlB = jnp.concatenate([loB0[:], loB1[:]], axis=0)
        yBh = _extract(WhB, cB, R)
        yBl = _extract(WlB, cB, R)
        mB = flat < lb
        yBh = jnp.where(mB, yBh, maxi)
        yBl = jnp.where(mB, yBl, maxi)
        # bitonic separator: A ascending vs B reversed — the winners
        # are the T smallest of the 2T slots (= every real element,
        # since exactly T slots are +inf-masked), and they form a
        # bitonic sequence a log2(T)-stage cleaner sorts ascending
        rh = _flat_reverse(yBh, R)
        rl = _flat_reverse(yBl, R)
        le = _lex_le(yAh, yAl, rh, rl)
        mh = jnp.where(le, yAh, rh)
        ml = jnp.where(le, yAl, rl)
        d = (R * _LANES) >> 1
        while d >= 1:
            mh, ml = _ce_stage(mh, ml, d, R)
            d >>= 1
        out_hi[:] = mh
        out_lo[:] = ml


def _merge_round(hi_p, lo_p, parts, n: int, T: int, interpret: bool):
    """One merge round: padded [n+T] inputs -> padded [n+T] outputs
    with runs twice as long over [0, n) and a sentinel tail."""
    R = T // _LANES
    nb = n // T
    hi2 = hi_p.reshape(-1, _LANES)
    lo2 = lo_p.reshape(-1, _LANES)

    def imA(off):
        def im(t, sblkA, scA, sla, sblkB, scB, slb):
            return (sblkA[t] + off, 0)
        return im

    def imB(off):
        def im(t, sblkA, scA, sla, sblkB, scB, slb):
            return (sblkB[t] + off, 0)
        return im

    bs = lambda im: pl.BlockSpec((R, _LANES), im)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nb + 1,),
        in_specs=[
            bs(imA(0)), bs(imA(1)), bs(imA(0)), bs(imA(1)),
            bs(imB(0)), bs(imB(1)), bs(imB(0)), bs(imB(1)),
        ],
        out_specs=[
            pl.BlockSpec((R, _LANES), lambda t, *_: (t, 0)),
            pl.BlockSpec((R, _LANES), lambda t, *_: (t, 0)),
        ],
    )
    shape = jax.ShapeDtypeStruct(hi2.shape, jnp.int32)
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_merge_kernel, R=R),
        grid_spec=grid_spec,
        out_shape=[shape, shape],
        interpret=interpret,
    )(*parts, hi2, hi2, lo2, lo2, hi2, hi2, lo2, lo2)
    return out_hi.reshape(-1), out_lo.reshape(-1)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def merge_sort_2key(hi, lo, *, block: int = 8192, interpret: bool = False):
    """Sort (hi, lo) lexicographically; exact lax.sort((hi, lo), 2)
    equivalent for non-negative int32 pairs.  N must satisfy
    merge_sort_eligible (callers fall back to lax.sort otherwise)."""
    n = hi.shape[0]
    if not merge_sort_eligible(n, block):
        return lax.sort((hi, lo), num_keys=2)
    T = block
    hs, ls = lax.sort(
        (hi.reshape(-1, block), lo.reshape(-1, block)),
        dimension=1,
        num_keys=2,
    )
    pad = jnp.full(T, _MAXI, jnp.int32)
    hi_p = jnp.concatenate([hs.reshape(n), pad])
    lo_p = jnp.concatenate([ls.reshape(n), pad])
    L = block
    while L < n:
        parts = _partitions(hi_p, lo_p, L, T, n)
        hi_p, lo_p = _merge_round(hi_p, lo_p, parts, n, T, interpret)
        L *= 2
    return hi_p[:n], lo_p[:n]
