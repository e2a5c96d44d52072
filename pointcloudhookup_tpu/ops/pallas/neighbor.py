"""Fused neighbor-reduction Pallas kernel.

The clustering inner loop — "for every element, reduce over all
elements within eps" — is the hot op of both the exact DBSCAN
(point level) and the grid DBSCAN (cell level).  The XLA path
materializes [M, tile] distance blocks in HBM per scan step; this
kernel keeps the whole element table VMEM-resident (coordinates as
three 1-D f32 arrays — a [M,3] layout would pad the last dim to 128
lanes and blow VMEM 42x) and evaluates the threshold + weighted
population + min-label reductions in registers, so HBM traffic is O(M)
instead of O(M^2 / tile).

d^2 is computed from coordinate DIFFERENCES (dx^2+dy^2+dz^2), not the
|x|^2 - 2xy expansion: exact in f32 at corridor coordinate scales and
needs no MXU (the K=3 contraction never fed it anyway).

Culling is PRECOMPUTED at 256-element subtile granularity on BOTH
sides (round 5; the column side is the cluster_converge recipe):
sparse tables (corridor vegetation cells) make 1024-element block
AABBs span hundreds of meters, so block-level gap tests barely cull;
their 256-element quarters do.  Near lists are built per ROW SUBTILE
(256 rows) against column subtiles, then collapsed to column-block
visits: one tiny [nb4, nb] XLA sort packs each row subtile's near
column-block indices to the front; the kernel loops over exactly the
near pairs and computes each visited block IN FULL for that row
subtile ([256, 1024] evals/visit instead of [1024, 1024]) —
in-kernel predication is what the loop replaces (per-block lax.cond
over ALL blocks cost 14 ms at 57k sparse cells; per-subtile pl.when
bits cost ~4 us of Mosaic scheduling barrier EACH, 5x the work they
skipped).  Row-side tightening cut the exact path's pop pass from
5.26 ms to 1.54 ms at the 4M bench tile's 38k alive cells (on-chip
cut profile, scripts/profile_exact.py).

Outputs (both in one pass):
  pop[i]  = sum_j  (d2(i,j) <= eps2 & allowed_j) * weight_j
  lmin[i] = min_j  (d2(i,j) <= eps2 & allowed_j) ? label_j : sentinel

Alignment: dynamic slices of 1-D f32 VMEM arrays must be multiples of
1024 (8 sublanes x 128 lanes), hence the 1024 block size with static
256-wide sub-tiles bounding the [BM, sub] temporaries to ~1 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024  # minimum aligned dynamic-slice granule for 1-D f32 VMEM
_SUB = 256  # static sub-tile of the column block (temp = [_BLOCK, _SUB])
_NSUB = _BLOCK // _SUB


def _kernel(eps2_ref, ncnt_ref, ncol_ref,
            x_ref, y_ref, z_ref, label_ref, weight_ref, allowed_ref,
            pop_ref, lmin_ref, *, sentinel: int, mode: str):
    bm = pop_ref.shape[0]
    i = pl.program_id(0)
    eps2 = eps2_ref[0]

    row_off = pl.multiple_of(i * bm, bm)
    rx = x_ref[pl.ds(row_off, bm)]
    ry = y_ref[pl.ds(row_off, bm)]
    rz = z_ref[pl.ds(row_off, bm)]

    # each 256-row subtile walks ITS near-column-block list with
    # register accumulators (loop-carried [256] vectors)
    for s in range(_NSUB):
        rs = slice(s * _SUB, (s + 1) * _SUB)
        rxs, rys, rzs = rx[rs], ry[rs], rz[rs]

        def body(t, carry, rxs=rxs, rys=rys, rzs=rzs, s=s):
            pop_a, lmin_a = carry
            j = ncol_ref[i * _NSUB + s, t]
            off = pl.multiple_of(j * _BLOCK, _BLOCK)
            cx = x_ref[pl.ds(off, _BLOCK)]
            cy = y_ref[pl.ds(off, _BLOCK)]
            cz = z_ref[pl.ds(off, _BLOCK)]
            lab = label_ref[pl.ds(off, _BLOCK)]
            wgt = weight_ref[pl.ds(off, _BLOCK)]
            alw = allowed_ref[pl.ds(off, _BLOCK)]
            # every near block computes its FULL 1024 columns in static
            # subtile slices with NO predication: a pl.when per subtile
            # is a Mosaic scheduling barrier costing ~4 us — at ~600
            # visits x 4 subtiles that PREDICATION cost ~9 ms, 5x the
            # VPU work it was skipping.  Subtile-level AABBs still
            # tighten the near LIST itself (built in XLA below).
            for cs in range(_NSUB):
                sl = slice(cs * _SUB, (cs + 1) * _SUB)
                dx = rxs[:, None] - cx[sl][None, :]
                dy = rys[:, None] - cy[sl][None, :]
                dz = rzs[:, None] - cz[sl][None, :]
                d2 = dx * dx + dy * dy + dz * dz
                nb = (d2 <= eps2) & (alw[sl] > 0)[None, :]
                # mode-specialized: the pop pass never consumes lmin and
                # the border pass never consumes pop — each reduction is
                # ~40% of the visit's VPU work, so callers skip the dead
                # one
                if mode in ("both", "pop"):
                    pop_a = pop_a + jnp.sum(
                        jnp.where(nb, wgt[sl][None, :], 0.0), axis=1
                    )
                if mode in ("both", "lmin"):
                    lmin_a = jnp.minimum(
                        lmin_a,
                        jnp.min(
                            jnp.where(nb, lab[sl][None, :], sentinel), axis=1
                        ),
                    )
            return pop_a, lmin_a

        pop_a, lmin_a = jax.lax.fori_loop(
            0,
            ncnt_ref[i * _NSUB + s],
            body,
            (
                jnp.zeros((_SUB,), jnp.float32),
                jnp.full((_SUB,), sentinel, jnp.int32),
            ),
        )
        # static 256-stores (sublane-aligned); Mosaic cannot concatenate
        # four 256-vectors into one 1024 register vector
        pop_ref[rs] = pop_a
        lmin_ref[rs] = lmin_a


@functools.partial(
    jax.jit, static_argnames=("block_m", "sentinel", "interpret", "mode")
)
def neighbor_reduce(
    xyz,
    labels,
    weights,
    allowed,
    eps2,
    *,
    block_m: int = 1024,
    sentinel: int | None = None,
    interpret: bool = False,
    mode: str = "both",
):
    """Fused eps-neighborhood population + min-label reduction.

    xyz: f32[M,3]; labels: i32[M]; weights: f32[M]; allowed: bool[M];
    eps2: scalar.  M must be a multiple of 1024 (and of block_m).
    Returns (pop f32[M], lmin i32[M]).

    mode: "both" computes the two reductions; "pop" / "lmin" skip the
    unused one (the skipped output returns its identity — zeros /
    sentinel).
    """
    if mode not in ("both", "pop", "lmin"):
        raise ValueError(f"bad mode {mode!r}")
    m = xyz.shape[0]
    if m % _BLOCK or m % block_m:
        raise ValueError(f"M={m} must be a multiple of {_BLOCK}")
    if block_m != _BLOCK:
        raise ValueError(f"block_m must equal {_BLOCK} (one AABB granule per program)")
    if sentinel is None:
        sentinel = m
    x = xyz[:, 0]
    y = xyz[:, 1]
    z = xyz[:, 2]
    # Row AABBs cover every FINITE row at 1024 granularity (outputs are
    # read for rows outside `allowed` too, e.g. border-cell label
    # adoption); column AABBs cover ALLOWED rows only (others contribute
    # nothing) at 256-subtile granularity.  Dead capacity rows carry
    # +3e38 sentinels, so their granules cull away.
    big = jnp.float32(3.0e38)
    finite_cut = jnp.float32(1.0e37)
    alw = allowed.astype(bool)
    finite = jnp.abs(x) < finite_cut
    nb = m // _BLOCK

    def _bounds(v, sel, groups):
        vb = v.reshape(groups, -1)
        sb = sel.reshape(groups, -1)
        lo = jnp.min(jnp.where(sb, vb, big), axis=1)
        hi = jnp.max(jnp.where(sb, vb, -big), axis=1)
        return lo, hi

    def _aabb(sel, groups):
        xlo, xhi = _bounds(x, sel, groups)
        ylo, yhi = _bounds(y, sel, groups)
        zlo, zhi = _bounds(z, sel, groups)
        return (
            jnp.stack([xlo, ylo, zlo], axis=1),
            jnp.stack([xhi, yhi, zhi], axis=1),
        )

    nb4 = nb * _NSUB
    rlo, rhi = _aabb(finite, nb4)  # row SUBTILE AABBs [nb4, 3]
    sblo, sbhi = _aabb(alw, nb4)  # column subtile AABBs [nb4, 3]

    # near bits per (row subtile, column subtile); empty AABBs give inf
    # gaps (clamped) that cull as intended
    gap = jnp.maximum(
        jnp.maximum(
            sblo.reshape(nb, _NSUB, 3)[None, :, :, :]
            - rhi[:, None, None, :],
            rlo[:, None, None, :]
            - sbhi.reshape(nb, _NSUB, 3)[None, :, :, :],
        ),
        0.0,
    )
    gap = jnp.minimum(gap, big)
    near_sub = jnp.sum(gap * gap, axis=-1) <= jnp.float32(eps2)  # [nb4,nb,4]
    near = jnp.any(near_sub, axis=-1)  # [nb4, nb]: row subtile x col BLOCK
    cols = jnp.arange(nb, dtype=jnp.int32)[None, :]
    key = jnp.where(near, cols, nb + cols)
    key = jnp.sort(key, axis=1)
    ncol = jnp.where(key < nb, key, 0).astype(jnp.int32)
    ncnt = jnp.sum(near.astype(jnp.int32), axis=1)

    kernel = functools.partial(_kernel, sentinel=sentinel, mode=mode)
    pop, lmin = pl.pallas_call(
        kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ncnt [nb4]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ncol [nb4, nb]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z
            pl.BlockSpec(memory_space=pltpu.VMEM),  # labels
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # allowed
        ],
        out_specs=[
            pl.BlockSpec((block_m,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m,), jnp.float32),
            jax.ShapeDtypeStruct((m,), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([eps2], jnp.float32),
        ncnt,
        ncol,
        x,
        y,
        z,
        labels.astype(jnp.int32),
        weights.astype(jnp.float32),
        allowed.astype(jnp.int32),
    )
    return pop, lmin


def neighbor_reduce_reference(xyz, labels, weights, allowed, eps2, sentinel=None):
    """Pure-XLA oracle for tests.

    d^2 comes from coordinate DIFFERENCES, matching the kernel: the
    |x|^2 - 2xy expansion loses ~|x|^2/2^23 absolute accuracy in f32,
    which at corridor coordinate scales (km) is larger than eps^2 and
    flips borderline neighbor decisions."""
    m = xyz.shape[0]
    if sentinel is None:
        sentinel = m
    d2 = jnp.zeros((m, m), jnp.float32)
    for a in range(3):
        dv = xyz[:, None, a] - xyz[None, :, a]
        d2 = d2 + dv * dv
    nb = (d2 <= eps2) & allowed[None, :]
    pop = jnp.sum(jnp.where(nb, weights[None, :], 0.0), axis=1)
    lmin = jnp.min(jnp.where(nb, labels[None, :], sentinel), axis=1)
    return pop, lmin
