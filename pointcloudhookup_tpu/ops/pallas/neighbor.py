"""Fused neighbor-reduction Pallas kernel.

The clustering inner loop — "for every element, reduce over all
elements within eps" — is the hot op of both the exact DBSCAN
(point level) and the grid DBSCAN (cell level).  The XLA path
materializes [M, tile] distance blocks in HBM per scan step; this
kernel keeps everything in VMEM: one row-block of queries stays
resident while the full element table streams through the MXU
(d^2 = |x|^2 + |y|^2 - 2 x.y as an [BM,3]x[3,BK] contraction), and the
threshold + weighted-population + min-label reductions happen in
registers, so HBM traffic is O(M) instead of O(M^2 / tile).

Outputs (both in one pass):
  pop[i]  = sum_j  (d2(i,j) <= eps2 & allowed_j) * weight_j
  lmin[i] = min_j  (d2(i,j) <= eps2 & allowed_j) ? label_j : sentinel

Fits VMEM for tables up to ~256k elements (xyz + labels + weights ~
3 MB at 64k).  Falls back to the lax implementation in
ops/cluster_grid.py / ops/cluster.py on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(eps2_ref, xyz_ref, sq_ref, label_ref, weight_ref, allowed_ref,
            pop_ref, lmin_ref, *, block_k: int, sentinel: int):
    m = xyz_ref.shape[0]
    bm = pop_ref.shape[0]
    i = pl.program_id(0)
    eps2 = eps2_ref[0]

    row_off = pl.multiple_of(i * bm, bm)
    rows = xyz_ref[pl.ds(row_off, bm), :]  # [BM, 3]
    rows_sq = sq_ref[pl.ds(row_off, bm)]  # [BM]

    def body(j, carry):
        pop, lmin = carry
        # multiple_of: Mosaic must statically prove vector-load alignment
        # for dynamic slices of VMEM-resident arrays
        off = pl.multiple_of(j * block_k, block_k)
        cols = xyz_ref[pl.ds(off, block_k), :]  # [BK, 3]
        cols_sq = sq_ref[pl.ds(off, block_k)]
        lab = label_ref[pl.ds(off, block_k)]
        wgt = weight_ref[pl.ds(off, block_k)]
        alw = allowed_ref[pl.ds(off, block_k)]
        d2 = (
            rows_sq[:, None]
            + cols_sq[None, :]
            - 2.0
            * jax.lax.dot_general(
                rows,
                cols,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        nb = (d2 <= eps2) & (alw > 0)[None, :]
        pop = pop + jnp.sum(jnp.where(nb, wgt[None, :], 0.0), axis=1)
        lmin = jnp.minimum(
            lmin, jnp.min(jnp.where(nb, lab[None, :], sentinel), axis=1)
        )
        return pop, lmin

    pop0 = jnp.zeros((bm,), jnp.float32)
    lmin0 = jnp.full((bm,), sentinel, jnp.int32)
    pop, lmin = jax.lax.fori_loop(0, m // block_k, body, (pop0, lmin0))
    pop_ref[:] = pop
    lmin_ref[:] = lmin


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_k", "sentinel", "interpret")
)
def neighbor_reduce(
    xyz,
    labels,
    weights,
    allowed,
    eps2,
    *,
    block_m: int = 1024,
    block_k: int = 1024,
    sentinel: int | None = None,
    interpret: bool = False,
):
    """Fused eps-neighborhood population + min-label reduction.

    xyz: f32[M,3]; labels: i32[M]; weights: f32[M]; allowed: bool[M];
    eps2: scalar.  M must be a multiple of block_m and block_k.
    Returns (pop f32[M], lmin i32[M]).
    """
    m = xyz.shape[0]
    if m % block_m or m % block_k:
        raise ValueError(f"M={m} must be a multiple of block sizes")
    if sentinel is None:
        sentinel = m
    sq = jnp.sum(xyz * xyz, axis=1)
    kernel = functools.partial(_kernel, block_k=block_k, sentinel=sentinel)
    pop, lmin = pl.pallas_call(
        kernel,
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xyz (full table resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # |x|^2
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
        xyz,
        sq,
        labels.astype(jnp.int32),
        weights.astype(jnp.float32),
        allowed.astype(jnp.int32),
    )
    return pop, lmin


def neighbor_reduce_reference(xyz, labels, weights, allowed, eps2, sentinel=None):
    """Pure-XLA oracle for tests."""
    m = xyz.shape[0]
    if sentinel is None:
        sentinel = m
    d2 = (
        jnp.sum(xyz * xyz, axis=1)[:, None]
        + jnp.sum(xyz * xyz, axis=1)[None, :]
        - 2.0 * jnp.dot(xyz, xyz.T, precision=jax.lax.Precision.HIGHEST)
    )
    nb = (d2 <= eps2) & allowed[None, :]
    pop = jnp.sum(jnp.where(nb, weights[None, :], 0.0), axis=1)
    lmin = jnp.min(jnp.where(nb, labels[None, :], sentinel), axis=1)
    return pop, lmin
