"""Windowed duplicate suppression for the single-key cell sort
(sort_mode='cell').

After the 1-key sort by cell code k1 (within-cell bits w ride as a
payload), rows of one cell are contiguous but NOT ordered by w, so the
frontend's adjacent-row voxel-boundary test misses duplicate voxels
that land non-adjacent inside a cell run.  Restoring full (k1, w)
order costs ~4 ms/pass at 4M (XLA window sorts) or 4.6 ms (VMEM
bitonic, ops/pallas/winsort.py) — but dedup FLAGS don't need order at
all: a row is a duplicate iff an EARLIER row within its cell run holds
the same w, and for any cell run of length <= D+1 every pair of equal
rows lies within D positions of each other.  One bandwidth-bound pass
comparing each row against its D predecessors therefore yields exact
first-occurrence flags under the same run-length guarantee shape as
the window sorts, an order of magnitude cheaper.

Comparing (k1, w) exactly (two i32 compares) keeps false duplicates
impossible — a hashed single compare would drop a real voxel on a
collision.  Cross-block predecessors come from a second input view of
the same arrays rolled forward by one 128-lane row, so every lane's
d-th predecessor is reachable with cyclic rolls and a lane select; the
global first row masks its (wrapped, meaningless) cross predecessors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 256
_BLOCK = _ROWS * _LANES  # 32768 elements


def _kernel(k1_ref, w_ref, k1p_ref, wp_ref, out_ref, *, depth: int):
    i = pl.program_id(0)
    k1 = k1_ref[:]
    w = w_ref[:]
    k1p = k1p_ref[:]
    wp = wp_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
    row = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
    # the global first row's lane<d predecessors are wrap-around garbage
    # (i32 arithmetic throughout: Mosaic can't truncate vectors to i1)
    ok_wrap = 1 - (
        ((row == 0).astype(jnp.int32) * jnp.int32((i == 0).astype(jnp.int32)))
    )
    dup = jnp.zeros((_ROWS, _LANES), jnp.int32)
    for d in range(1, depth + 1):
        # predecessor at flat distance d: same row for lane >= d, else
        # the rolled-forward view (previous 128-lane row) at lane-d+128
        same = (
            (pltpu.roll(k1, shift=d, axis=1) == k1)
            & (pltpu.roll(w, shift=d, axis=1) == w)
        ).astype(jnp.int32)
        cross = (
            (pltpu.roll(k1p, shift=d, axis=1) == k1)
            & (pltpu.roll(wp, shift=d, axis=1) == w)
        ).astype(jnp.int32)
        dup = dup | jnp.where(lane >= d, same, cross * ok_wrap)
    out_ref[:] = 1 - dup


@functools.partial(jax.jit, static_argnames=("depth", "interpret"))
def first_occurrence_flags(k1, w, *, depth: int = 64, interpret: bool = False):
    """i32[N] flags: 1 where no equal (k1, w) pair occurs in the D
    preceding rows, else 0.  Exact first-occurrence flags whenever every
    k1-run has length <= depth+1.  N must be a multiple of 32768;
    depth < 128."""
    n = k1.shape[0]
    if n % _BLOCK:
        raise ValueError(f"N={n} must be a multiple of {_BLOCK}")
    if not 1 <= depth < _LANES:
        raise ValueError(f"depth must be in [1, {_LANES}), got {depth}")
    rows = n // _LANES
    nblocks = n // _BLOCK
    k1i = lax.bitcast_convert_type(k1.astype(jnp.uint32), jnp.int32)
    wi = w.astype(jnp.int32)
    k1p = jnp.roll(k1i, 128).reshape(rows, _LANES)
    wp = jnp.roll(wi, 128).reshape(rows, _LANES)
    k1i = k1i.reshape(rows, _LANES)
    wi = wi.reshape(rows, _LANES)

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    # the unrolled depth-loop keeps ~depth/2 [_ROWS,_LANES] temporaries
    # live on the Mosaic stack (~26 MB at depth=64), over the default
    # 16 MB scoped-vmem limit — raise it rather than shrink the block
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth),
        grid=(nblocks,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        interpret=interpret,
        **kwargs,
    )(k1i, wi, k1p, wp)
    return out.reshape(n)


def first_occurrence_flags_reference(k1, w, depth: int = 64):
    """Numpy oracle: flag[i] = no j in [i-depth, i) with equal (k1,w)."""
    import numpy as np

    k1 = np.asarray(k1)
    w = np.asarray(w)
    n = len(k1)
    dup = np.zeros(n, bool)
    for d in range(1, depth + 1):
        dup[d:] |= (k1[d:] == k1[:-d]) & (w[d:] == w[:-d])
    return (~dup).astype(np.int32)
