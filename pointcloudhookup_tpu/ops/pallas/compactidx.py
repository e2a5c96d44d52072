"""Positions of the first m set bits of a bool[N] array (TPU kernel).

The fused frontend packs its dense-cell table by materializing a global
cumsum (pidx_row) and binary-searching it m times
(jnp.searchsorted(pidx_row, arange(m))) — ~2 ms at N=4M, m=4096: the
gather rounds walk HBM 13+ times.  But the information is local: one
sequential pass over the flag array can emit each set bit's global
position into an SMEM table as it passes it.  Per 32k-row block: one
vector popcount, and only blocks that contain set bits pay a flat-order
rank cumsum plus one masked min-reduction per set bit (dense cells are
a few thousand over a 4M-row tile, so the per-bit loop is short).

Replaces: the pidx cumsum + searchsorted stage of
ops/frontend_fused.py (reference semantics: the chunked-DBSCAN grid of
/root/reference/utils/tower_extraction.py:96-122 has no analogue — the
m-table is a TPU-design artifact).
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
_BLOCK = _ROWS * _LANES  # 32768


def _kernel(flag_ref, out_ref, n_ref, *, m: int, fill: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        n_ref[0] = 0

    base = i * _BLOCK
    f = flag_ref[:]  # [R, 128] i32 0/1
    cnt = jnp.sum(f)

    @pl.when(cnt > 0)
    def _():
        lane = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
        row = lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
        # inclusive flat-order rank: lane cumsum within rows, plus the
        # exclusive prefix of per-row totals down the rows
        s = f
        d = 1
        while d < _LANES:
            add = pltpu.roll(s, shift=d, axis=1)
            s = jnp.where(lane >= d, s + add, s)
            d <<= 1
        tot = s[:, _LANES - 1 :]  # [R, 1] per-row totals
        p = tot
        d = 1
        while d < _ROWS:
            add = pltpu.roll(p, shift=d, axis=0)
            p = jnp.where(row[:, :1] >= d, p + add, p)
            d <<= 1
        rank = s + (p - tot)  # inclusive flat rank of each position
        flat = row * _LANES + lane
        bigi = jnp.int32(2**30)
        n0 = n_ref[0]

        # emission at TILE granularity: the per-bit masked min used to
        # scan the whole [256,128] block (~200 cycles/bit — 3 ms at
        # 1M rows / 3.5k bits); restricting each bit's scan to its own
        # (8,128) tile cuts that ~30x.  Tiles are static slices of the
        # rank/flag values, so no dynamic sublane addressing is needed.
        for t in range(_ROWS // 8):
            r0 = t * 8
            t_f = f[r0:r0 + 8, :]
            t_rank = rank[r0:r0 + 8, :]
            t_flat = flat[r0:r0 + 8, :]
            if t == 0:
                prev = jnp.int32(0)
            else:
                prev = jnp.sum(rank[r0 - 1:r0, _LANES - 1:])
            tcnt = jnp.sum(rank[r0 + 7:r0 + 8, _LANES - 1:]) - prev

            @pl.when(tcnt > 0)
            def _(t_f=t_f, t_rank=t_rank, t_flat=t_flat, prev=prev,
                  tcnt=tcnt):
                def body(j, carry):
                    jr = prev + j + 1
                    tgt = jnp.min(
                        jnp.where((t_f > 0) & (t_rank == jr), t_flat, bigi)
                    )
                    k = n0 + jr - 1

                    @pl.when(k < m)
                    def _emit():
                        out_ref[k] = base + tgt

                    return carry

                lax.fori_loop(0, tcnt, body, 0)

        n_ref[0] = n0 + cnt

    @pl.when(i == nb - 1)
    def _():
        # dead slots mimic the clipped searchsorted: position n-1
        n_fin = n_ref[0]

        def pad(k, carry):
            @pl.when(k >= n_fin)
            def _fill():
                out_ref[k] = fill

            return carry

        lax.fori_loop(0, m, pad, 0)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def compact_indices(flag, m: int, *, interpret: bool = False):
    """Global positions (ascending) of the first m True entries of
    flag[N]; slots beyond the total count hold N-1 (matching the
    clip(searchsorted) convention the frontend's m-table pack uses).
    N must be a multiple of 32768 for the TPU kernel; other sizes and
    other backends use the XLA cumsum+searchsorted reference."""
    n = flag.shape[0]
    if (
        jax.default_backend() != "tpu" and not interpret
    ) or n % _BLOCK:
        return compact_indices_reference(flag, m)
    f2 = flag.astype(jnp.int32).reshape(-1, _LANES)
    out = pl.pallas_call(
        functools.partial(_kernel, m=m, fill=n - 1),
        grid=(n // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((m,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(f2)
    return out


def compact_indices_reference(flag, m: int):
    """XLA oracle: exactly the frontend's previous cumsum+searchsorted."""
    n = flag.shape[0]
    pidx = jnp.cumsum(flag.astype(jnp.int32)) - 1
    return jnp.clip(
        jnp.searchsorted(pidx, jnp.arange(m, dtype=jnp.int32), side="left"),
        0,
        n - 1,
    ).astype(jnp.int32)
