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


def _kernel(eps2_ref, rlo_ref, rhi_ref, blo_ref, bhi_ref, x_ref, y_ref, z_ref,
            label_ref, weight_ref, allowed_ref, pop_ref, lmin_ref, *, sentinel: int):
    m = x_ref.shape[0]
    bm = pop_ref.shape[0]
    i = pl.program_id(0)
    eps2 = eps2_ref[0]

    row_off = pl.multiple_of(i * bm, bm)
    rx = x_ref[pl.ds(row_off, bm)]
    ry = y_ref[pl.ds(row_off, bm)]
    rz = z_ref[pl.ds(row_off, bm)]

    # this row block's AABB (block_m == _BLOCK: one granule per program).
    # Row bounds cover every FINITE row (outputs are read for rows
    # outside `allowed` too, e.g. border-cell label adoption); column
    # bounds cover allowed rows only (others contribute nothing).
    rx_lo = rlo_ref[i, 0]
    ry_lo = rlo_ref[i, 1]
    rz_lo = rlo_ref[i, 2]
    rx_hi = rhi_ref[i, 0]
    ry_hi = rhi_ref[i, 1]
    rz_hi = rhi_ref[i, 2]

    def body(j, carry):
        pop, lmin = carry
        # column-block AABB vs row-block AABB: skip far blocks (the
        # Morton-packed table is spatially coherent, and dead capacity
        # rows sit at +3e38, so most block pairs cull)
        cx_lo = blo_ref[j, 0]
        cy_lo = blo_ref[j, 1]
        cz_lo = blo_ref[j, 2]
        cx_hi = bhi_ref[j, 0]
        cy_hi = bhi_ref[j, 1]
        cz_hi = bhi_ref[j, 2]
        gx = jnp.maximum(jnp.maximum(cx_lo - rx_hi, rx_lo - cx_hi), 0.0)
        gy = jnp.maximum(jnp.maximum(cy_lo - ry_hi, ry_lo - cy_hi), 0.0)
        gz = jnp.maximum(jnp.maximum(cz_lo - rz_hi, rz_lo - cz_hi), 0.0)
        near = gx * gx + gy * gy + gz * gz <= eps2

        def compute(carry):
            pop, lmin = carry
            off = pl.multiple_of(j * _BLOCK, _BLOCK)
            cx = x_ref[pl.ds(off, _BLOCK)]
            cy = y_ref[pl.ds(off, _BLOCK)]
            cz = z_ref[pl.ds(off, _BLOCK)]
            lab = label_ref[pl.ds(off, _BLOCK)]
            wgt = weight_ref[pl.ds(off, _BLOCK)]
            alw = allowed_ref[pl.ds(off, _BLOCK)]
            # static sub-tiles keep the [bm, _SUB] temporaries small
            for s in range(_BLOCK // _SUB):
                sl = slice(s * _SUB, (s + 1) * _SUB)
                dx = rx[:, None] - cx[sl][None, :]
                dy = ry[:, None] - cy[sl][None, :]
                dz = rz[:, None] - cz[sl][None, :]
                d2 = dx * dx + dy * dy + dz * dz
                nb = (d2 <= eps2) & (alw[sl] > 0)[None, :]
                pop = pop + jnp.sum(jnp.where(nb, wgt[sl][None, :], 0.0), axis=1)
                lmin = jnp.minimum(
                    lmin, jnp.min(jnp.where(nb, lab[sl][None, :], sentinel), axis=1)
                )
            return pop, lmin

        return jax.lax.cond(near, compute, lambda c: c, carry)

    pop0 = jnp.zeros((bm,), jnp.float32)
    lmin0 = jnp.full((bm,), sentinel, jnp.int32)
    pop, lmin = jax.lax.fori_loop(0, m // _BLOCK, body, (pop0, lmin0))
    pop_ref[:] = pop
    lmin_ref[:] = lmin


@functools.partial(jax.jit, static_argnames=("block_m", "sentinel", "interpret"))
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
):
    """Fused eps-neighborhood population + min-label reduction.

    xyz: f32[M,3]; labels: i32[M]; weights: f32[M]; allowed: bool[M];
    eps2: scalar.  M must be a multiple of 1024 (and of block_m).
    Returns (pop f32[M], lmin i32[M]).
    """
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
    # per-1024-granule AABBs.  Column culling uses ALLOWED-only bounds
    # (disallowed rows contribute nothing); row culling uses FINITE-row
    # bounds (outputs are consumed for non-allowed rows too).  Dead
    # capacity rows carry +3e38 sentinels, so their blocks cull away.
    big = jnp.float32(3.0e38)
    finite_cut = jnp.float32(1.0e37)
    alw = allowed.astype(bool)
    finite = jnp.abs(x) < finite_cut
    nb = m // _BLOCK

    def _bounds(v, sel):
        vb = v.reshape(nb, _BLOCK)
        sb = sel.reshape(nb, _BLOCK)
        lo = jnp.min(jnp.where(sb, vb, big), axis=1)
        hi = jnp.max(jnp.where(sb, vb, -big), axis=1)
        return lo, hi

    def _aabb(sel):
        xlo, xhi = _bounds(x, sel)
        ylo, yhi = _bounds(y, sel)
        zlo, zhi = _bounds(z, sel)
        return jnp.stack([xlo, ylo, zlo], axis=1), jnp.stack([xhi, yhi, zhi], axis=1)

    rlo, rhi = _aabb(finite)
    blo, bhi = _aabb(alw)

    kernel = functools.partial(_kernel, sentinel=sentinel)
    pop, lmin = pl.pallas_call(
        kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row AABB lo [nb,3]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row AABB hi [nb,3]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # col AABB lo [nb,3]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # col AABB hi [nb,3]
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
        rlo,
        rhi,
        blo,
        bhi,
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
