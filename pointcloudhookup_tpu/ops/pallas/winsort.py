"""In-VMEM window sort for the hierarchical Morton sort (sort_mode='hier').

After the single-u32-key cell sort, full (cell, within-cell) order only
needs restoring WITHIN 256-element windows at offsets 0 and 128 (any
cell run <= 129 then lies wholly inside some window).  XLA's batched
minor-dim sort costs ~4 ms/pass at 4M — per-stage overhead dominates at
short rows — while a VMEM-resident bitonic network is bandwidth-bound
at ONE HBM pass.

The key trick makes the network single-operand: within a window, rows
are already grouped by the (already-sorted) cell key k1, so sorting by
(k1, w) == sorting by (rank, w) where rank = # distinct k1 values
before the element IN ITS WINDOW (< 256).  pack = (rank << 16) | w
fits i32, sorts ascending, and k1 itself is INVARIANT under the window
sort (its multiset per window is already sorted) — the kernel reads k1
only for boundary flags and writes only w.

Network per 256-window laid out as two [128]-lane rows:
  pass A kernel: row-wise bitonic-128 (28 stages, even rows ascending,
  odd rows descending) + pairwise bitonic merge (1 reversed cross-row
  stage + 7 lane stages);
  pass B kernel: merge-only (8 stages) on the array rolled up by one
  row, so offset windows become row pairs; the cyclic wrap window
  (last, first) is skipped — it is not a real interval.

Lane-distance exchanges use the XOR-shuffle identity lane^d =
lane +/- d selected by bit d (two cyclic rolls + select); the reversed
cross-row stage uses lane^127 = 127-lane (flip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 256          # rows per block
_BLOCK = _ROWS * _LANES  # 32768 elements


def _xor_partner(x, d, lane):
    """Value of each element's XOR-shuffle partner at lane distance d."""
    # pltpu.roll requires non-negative shifts: roll by L-d == roll by -d
    plus = pltpu.roll(x, shift=_LANES - d, axis=1)   # lane l <- l + d
    minus = pltpu.roll(x, shift=d, axis=1)           # lane l <- l - d
    return jnp.where((lane & d) == 0, plus, minus)


def _reverse_lanes(x, lane):
    """x[:, ::-1] without the (unsupported) rev primitive: lane ^ 127
    is the composition of full XOR-exchanges at 64, 32, ..., 1."""
    d = _LANES >> 1
    while d >= 1:
        x = _xor_partner(x, d, lane)
        d >>= 1
    return x


def _lane_stage(key, d, lane, asc):
    """One bitonic compare-exchange stage at lane distance d.
    asc: bool [R,128] — ascending direction per element."""
    p = _xor_partner(key, d, lane)
    lower = (lane & d) == 0
    take_min = lower == asc
    return jnp.where(take_min, jnp.minimum(key, p), jnp.maximum(key, p))


def _row_sort(key, lane, asc_row):
    """Bitonic sort of each 128-lane row; direction per row from
    asc_row (broadcastable [R,1] bool)."""
    k = 2
    while k <= _LANES:
        # direction within the k-phase: ascending iff (lane & k) == 0,
        # globally flipped for descending rows; the final k == _LANES
        # phase has (lane & k) == 0 everywhere
        asc = ((lane & k) == 0) == asc_row
        j = k >> 1
        while j >= 1:
            key = _lane_stage(key, j, lane, asc)
            j >>= 1
        k <<= 1
    return key


def _pair_merge(key, lane, row, skip=None):
    """Bitonic merge of row pairs (2j asc, 2j+1 desc) -> sorted
    ascending 256-windows.  skip: optional [R,1] bool — rows whose
    window must be left untouched (cyclic wrap window)."""
    orig = key
    # stage 1: a[i] vs b[127-i] — partner is the OTHER row, lanes
    # reversed (lane ^ 127 = 127 - lane)
    other = jnp.where(
        (row & 1) == 0,
        pltpu.roll(key, shift=_ROWS - 1, axis=0),
        pltpu.roll(key, shift=1, axis=0),
    )
    other = _reverse_lanes(other, lane)
    first = (row & 1) == 0
    key = jnp.where(
        first, jnp.minimum(key, other), jnp.maximum(key, other)
    )
    # clean stages: each row is now bitonic; 7 ascending lane stages
    j = _LANES >> 1
    while j >= 1:
        key = _lane_stage(key, j, lane, True)
        j >>= 1
    if skip is not None:
        key = jnp.where(skip, orig, key)
    return key


def _ranks(k1, lane, row):
    """0-based rank of each element's distinct-k1 group within its
    256-element (row-pair) window."""
    # previous element in row-major order: (r, l-1), or (r-1, 127)
    same_row = pltpu.roll(k1, shift=1, axis=1)
    prev_row = pltpu.roll(same_row, shift=1, axis=0)
    prev = jnp.where(lane == 0, prev_row, same_row)
    flag = (k1 != prev).astype(jnp.int32)
    # window start (row even, lane 0) has no predecessor: rank 0
    flag = jnp.where((lane == 0) & ((row & 1) == 0), 0, flag)
    # plain cumsum along lanes (7 masked roll-add steps)
    s = flag
    d = 1
    while d < _LANES:
        add = pltpu.roll(s, shift=d, axis=1)
        s = jnp.where(lane >= d, s + add, s)
        d <<= 1
    # odd rows add their window-first row's total
    tot_prev = pltpu.roll(s[:, _LANES - 1 :], shift=1, axis=0)
    s = jnp.where((row & 1) == 1, s + tot_prev, s)
    return s


def _kernel_sort(k1_ref, w_ref, out_ref):
    """Pass A: full 256-window sort (row pairs (0,1),(2,3),...)."""
    k1 = k1_ref[:]
    w = w_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
    row = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
    r = _ranks(k1, lane, row)
    key = (r << 16) | w
    key = _row_sort(key, lane, True)
    key = _pair_merge(key, lane, row)
    out_ref[:] = key & 0xFFFF


def _kernel_merge(k1_ref, w_ref, out_ref, *, nblocks):
    """Pass B: merge-only on the up-rolled array; rows are each sorted
    ascending (halves of pass-A windows).  Skips the wrap window."""
    i = pl.program_id(0)
    k1 = k1_ref[:]
    w = w_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
    row = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
    r = _ranks(k1, lane, row)
    key = (r << 16) | w
    is_wrap = (i == nblocks - 1) & (row >= _ROWS - 2)
    key = _pair_merge(key, lane, row, skip=is_wrap)
    out_ref[:] = key & 0xFFFF


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_sort_w(k1, w, *, interpret: bool = False):
    """Restore (k1, w) order within 256-element windows at offsets 0
    and 128 of a k1-sorted array.  Returns the re-ordered w (i32); k1
    is invariant.  N must be a multiple of 32768."""
    n = k1.shape[0]
    if n % _BLOCK:
        raise ValueError(f"N={n} must be a multiple of {_BLOCK}")
    rows = n // _LANES
    nblocks = n // _BLOCK
    k1i = lax.bitcast_convert_type(k1, jnp.int32).reshape(rows, _LANES)
    w2 = w.astype(jnp.int32).reshape(rows, _LANES)

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    w2 = pl.pallas_call(
        _kernel_sort, grid=(nblocks,), in_specs=[spec, spec],
        out_specs=spec, out_shape=shape, interpret=interpret,
    )(k1i, w2)

    # offset pass: roll rows up by one so offset windows are row pairs
    k1r = jnp.roll(k1i, shift=-1, axis=0)
    w2r = jnp.roll(w2, shift=-1, axis=0)
    w2r = pl.pallas_call(
        functools.partial(_kernel_merge, nblocks=nblocks),
        grid=(nblocks,), in_specs=[spec, spec],
        out_specs=spec, out_shape=shape, interpret=interpret,
    )(k1r, w2r)
    w2 = jnp.roll(w2r, shift=1, axis=0)
    return w2.reshape(n)
