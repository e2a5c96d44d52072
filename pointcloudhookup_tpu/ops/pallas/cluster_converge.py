"""Whole-clustering-loop Pallas kernel: pop + label convergence + border
adoption in ONE invocation.

The front-end's cell-graph clustering previously ran as an XLA
`while_loop` around the neighbor kernel: one kernel launch for the
population pass, one per label-propagation round, one for the border
pass — each paying launch/glue overhead and an HBM round-trip of the
m-table.  At m=8192 every table is a few tens of KB, so the ENTIRE loop
fits in VMEM: this kernel runs the population pass, Jacobi min-label
rounds with an early-exit convergence flag, and the final border
adoption inside a single program (grid=(1,)).

Cell-graph diameters are tiny for compact structures (eps = 2.5x the
cell pitch makes a tower's cells a near-clique) so convergence usually
takes 1-3 Jacobi rounds with early exit; the iteration BOUND defaults
to M, the worst-case chain length, so arbitrarily long thin clusters
(conductor lines, vegetation strips) still converge correctly instead
of silently splitting at an arbitrary cap.

Block-pair AABB culling is PRECOMPUTED: evaluating the [nb, nb] AABB
gap tests as per-pair `lax.cond`s inside the kernel cost ~4096 scalar
branches PER PASS (~1 ms/pass at m=8192 — more than the surviving
pairwise compute, since the packed table is typically <50% dense and
Morton-ordered blocks are spatially local).  The host-side wrapper now
builds per-row NEAR-COLUMN lists with one tiny [nb, nb] XLA sort and
passes them through SMEM; every pass loops over exactly the near pairs
and nothing else.

Label propagation WITHIN a block was Jacobi (the whole row updates
from one snapshot): a tower's ~125-cell graph has ~5-hop diameter, so
convergence took ~6 full-table walks on the bench tile.  Each row
visit now runs an intra-block flood to convergence (a [B, B] min-label
loop over the row's own distance tile, ~10 us/iteration) so a round's
cost is one CROSS-block hop plus complete within-block flooding, and
the outer loop converges in 2-3 walks regardless of within-block chain
length.  (Finer than 1024-cell blocks would also cull better, but 1D
VMEM dynamic slices must be (8,128)-tile = 1024-element aligned; big
tables instead cull 256-cell COLUMN subtiles via per-pair bit masks —
see the sub_cull note at the kernel build site.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024  # 1D VMEM dynamic slices must be (8,128)-tile aligned
_SUB = 256


def _kernel(
    eps2_ref, minpts_ref, nba_ref, ncnt_ref, ncol_ref, subm_ref,  # SMEM
    x_ref, y_ref, z_ref, w_ref, alive_ref, lab0_ref,  # VMEM in
    lab_out, pop_out,  # VMEM out
    cur_ref, core_ref, bord_ref, accf_ref, acci_ref,  # VMEM scratch
    *, m: int, max_iter: int, sub_cull: bool,
):
    eps2 = eps2_ref[0]
    minpts = minpts_ref[0]
    # the packed table puts its n_dense live rows FIRST, so only the
    # leading nba blocks can hold alive cells; every per-row loop below
    # is bounded by nba — at a typical <50%-full table the loop
    # machinery (scalar iteration + per-row writes + convergence
    # reduction) dominated the surviving pairwise compute when all
    # m/_BLOCK blocks were walked each pass
    nba = nba_ref[0]
    big_sent = jnp.int32(m)

    # dead-capacity blocks never enter a loop: initialize their outputs
    # with whole-array writes, the live prefix overwrites below
    pop_out[:] = jnp.zeros((m,), jnp.float32)
    core_ref[:] = jnp.zeros((m,), jnp.int32)
    cur_ref[:] = jnp.full((m,), big_sent, jnp.int32)
    bord_ref[:] = jnp.full((m,), big_sent, jnp.int32)
    lab_out[:] = jnp.full((m,), big_sent, jnp.int32)

    def row_slice(ref, r):
        return ref[pl.ds(pl.multiple_of(r * _BLOCK, _BLOCK), _BLOCK)]

    # ---- population pass: pop[i] = sum of w over alive eps-neighbors.
    # Column subtiles are culled per 256-cell chunk via SMEM masks (the
    # packed table's 1024-cell blocks span ~1 km at corridor density —
    # dense cells are ~3% of Morton space — so block-level AABBs barely
    # cull; the 4-bit sub-masks skip ~half the [1024, 256] subtiles).
    # Accumulators live in VMEM scratch because pl.when bodies can only
    # mutate refs, not carry values.
    def pop_row(r, _):
        rx = row_slice(x_ref, r)
        ry = row_slice(y_ref, r)
        rz = row_slice(z_ref, r)
        accf_ref[:] = jnp.zeros((_BLOCK,), jnp.float32)

        def col(j, carry):
            c = ncol_ref[r, j]
            bits = subm_ref[r, c]
            off = pl.ds(pl.multiple_of(c * _BLOCK, _BLOCK), _BLOCK)
            cx = x_ref[off]
            cy = y_ref[off]
            cz = z_ref[off]
            cw = w_ref[off]
            ca = alive_ref[off]
            def subtile(s):
                sl = slice(s * _SUB, (s + 1) * _SUB)
                dx = rx[:, None] - cx[sl][None, :]
                dy = ry[:, None] - cy[sl][None, :]
                dz = rz[:, None] - cz[sl][None, :]
                d2 = dx * dx + dy * dy + dz * dz
                nbm = (d2 <= eps2) & (ca[sl] > 0)[None, :]
                accf_ref[:] = accf_ref[:] + jnp.sum(
                    jnp.where(nbm, cw[sl][None, :], 0.0), axis=1
                )

            for s in range(_BLOCK // _SUB):
                if sub_cull:
                    pl.when(((bits >> s) & 1) == 1)(
                        functools.partial(subtile, s)
                    )
                else:
                    subtile(s)
            return carry

        lax.fori_loop(0, ncnt_ref[r], col, 0)
        acc = accf_ref[:]
        off_r = pl.ds(pl.multiple_of(r * _BLOCK, _BLOCK), _BLOCK)
        pop_out[off_r] = acc
        ra = row_slice(alive_ref, r)
        core = (acc >= minpts) & (ra > 0)
        core_ref[off_r] = core.astype(jnp.int32)
        # seed: run-merged labels on core cells, sentinel elsewhere
        l0 = row_slice(lab0_ref, r)
        cur_ref[off_r] = jnp.where(core, l0, big_sent)
        return _

    lax.fori_loop(0, nba, pop_row, 0)

    # ---- Jacobi min-label rounds over CORE cells, early exit
    def lmin_row(r):
        """min label over CORE eps-neighbors of row block r (reads cur_ref)."""
        rx = row_slice(x_ref, r)
        ry = row_slice(y_ref, r)
        rz = row_slice(z_ref, r)
        acci_ref[:] = jnp.full((_BLOCK,), big_sent, jnp.int32)

        def col(j, carry):
            c = ncol_ref[r, j]
            bits = subm_ref[r, c]
            off = pl.ds(pl.multiple_of(c * _BLOCK, _BLOCK), _BLOCK)
            cx = x_ref[off]
            cy = y_ref[off]
            cz = z_ref[off]
            cl = cur_ref[off]
            cc = core_ref[off]
            def subtile(s):
                sl = slice(s * _SUB, (s + 1) * _SUB)
                dx = rx[:, None] - cx[sl][None, :]
                dy = ry[:, None] - cy[sl][None, :]
                dz = rz[:, None] - cz[sl][None, :]
                d2 = dx * dx + dy * dy + dz * dz
                nbm = (d2 <= eps2) & (cc[sl] > 0)[None, :]
                acci_ref[:] = jnp.minimum(
                    acci_ref[:],
                    jnp.min(
                        jnp.where(nbm, cl[sl][None, :], big_sent), axis=1
                    ),
                )

            for s in range(_BLOCK // _SUB):
                if sub_cull:
                    pl.when(((bits >> s) & 1) == 1)(
                        functools.partial(subtile, s)
                    )
                else:
                    subtile(s)
            return carry

        lax.fori_loop(0, ncnt_ref[r], col, 0)
        return acci_ref[:]

    def round_body(carry):
        it, _ = carry
        # Gauss-Seidel with alternating sweep direction: updates land in
        # cur_ref immediately (min-label flooding is monotone, so
        # in-place updates are always safe and strictly faster than
        # Jacobi), and because Morton order is spatially coherent a
        # whole structure's min label floods through it in ONE sweep
        # instead of one hop per round.  Alternating the direction
        # handles chains that run against the sweep.
        backward = (it & 1) == 1

        def one_row(r, changed):
            r2 = jnp.where(backward, nba - 1 - r, r)
            lmin = lmin_row(r2)
            off = pl.ds(pl.multiple_of(r2 * _BLOCK, _BLOCK), _BLOCK)
            old = cur_ref[off]
            is_core = core_ref[off] > 0
            new = jnp.where(is_core, jnp.minimum(old, lmin), old)
            # intra-block flood to convergence: one cross-block hop per
            # outer round is enough when the block's OWN chains collapse
            # completely here (min-label flooding is monotone, so extra
            # in-place hops are always safe)
            rx = row_slice(x_ref, r2)
            ry = row_slice(y_ref, r2)
            rz = row_slice(z_ref, r2)
            dx = rx[:, None] - rx[None, :]
            dy = ry[:, None] - ry[None, :]
            dz = rz[:, None] - rz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            nbm_rr = (d2 <= eps2) & (is_core[None, :])

            def intra_body(c):
                lab_r, _ = c
                cand = jnp.min(
                    jnp.where(nbm_rr, lab_r[None, :], big_sent), axis=1
                )
                new2 = jnp.where(is_core, jnp.minimum(lab_r, cand), lab_r)
                return new2, jnp.any(new2 != lab_r)

            new, _ = lax.while_loop(
                lambda c: c[1], intra_body, intra_body((new, jnp.bool_(True)))
            )
            cur_ref[off] = new
            # border fold: lmin is the min label over CORE neighbors for
            # EVERY cell of the row, which is exactly border adoption —
            # the loop's final sweep is the no-change sweep, so its lmin
            # is computed against converged labels and no separate
            # border pass (one full pair-walk) is needed
            bord_ref[off] = lmin
            return changed | jnp.any(new != old)

        changed = lax.fori_loop(0, nba, one_row, jnp.bool_(False))
        return it + 1, changed

    lax.while_loop(
        lambda c: c[1] & (c[0] < max_iter),
        round_body,
        (jnp.int32(0), jnp.bool_(True)),
    )

    # ---- border adoption from the folded sweep values: non-core alive
    # cells take the min core neighbor's label; dead rows keep sentinel
    def border_row(r, _):
        off = pl.ds(pl.multiple_of(r * _BLOCK, _BLOCK), _BLOCK)
        is_core = core_ref[off] > 0
        ra = row_slice(alive_ref, r) > 0
        lab_out[off] = jnp.where(
            is_core, cur_ref[off], jnp.where(ra, bord_ref[off], big_sent)
        )
        return _

    lax.fori_loop(0, nba, border_row, 0)


@functools.partial(jax.jit, static_argnames=("max_iter", "interpret"))
def cluster_cells(
    centers,
    ccount,
    alive,
    labels0,
    eps2,
    min_points,
    *,
    max_iter: int | None = None,
    interpret: bool = False,
):
    """Population + min-label convergence + border adoption, one kernel.

    centers f32[M,3] (dead rows at +3e38), ccount f32[M], alive bool[M],
    labels0 i32[M] seed labels (used on rows that turn out core).
    Returns (labels i32[M] in [0,M) with M = no cluster, pop f32[M]).
    M must be a multiple of 1024.
    """
    m = centers.shape[0]
    if m % _BLOCK:
        raise ValueError(f"M={m} must be a multiple of {_BLOCK}")
    if max_iter is None:
        max_iter = m  # worst-case chain length; early exit keeps the
        # typical cost at 1-3 rounds
    x = centers[:, 0]
    y = centers[:, 1]
    z = centers[:, 2]
    big = jnp.float32(3.0e38)
    finite = jnp.abs(x) < jnp.float32(1.0e37)
    alw = alive.astype(bool)
    nb = m // _BLOCK

    def _bounds_g(v, sel, groups):
        vb = v.reshape(groups, -1)
        sb = sel.reshape(groups, -1)
        return (
            jnp.min(jnp.where(sb, vb, big), axis=1),
            jnp.max(jnp.where(sb, vb, -big), axis=1),
        )

    def _aabb_g(sel, groups):
        xlo, xhi = _bounds_g(x, sel, groups)
        ylo, yhi = _bounds_g(y, sel, groups)
        zlo, zhi = _bounds_g(z, sel, groups)
        return (
            jnp.stack([xlo, ylo, zlo], axis=1),
            jnp.stack([xhi, yhi, zhi], axis=1),
        )

    rlo, rhi = _aabb_g(finite, nb)

    # per-row near-column lists (see module docstring): row r's finite
    # AABB vs col c's alive AABB at 256-cell SUBTILE granularity on the
    # column side — the packed table's 1024-cell blocks span ~1 km at
    # corridor density, so block-level AABBs barely cull, but their
    # 256-cell quarters do.  submask[r, c] packs the 4 per-subtile
    # near bits; a block pair is near iff any bit survives.  One
    # [nb, nb] sort packs each row's near col indices to the front; the
    # kernel loops over ncnt[r] entries and skips dead subtiles with
    # pl.when on the bits.
    nsub = _BLOCK // _SUB
    sblo, sbhi = _aabb_g(alw, nb * nsub)

    gap_s = jnp.maximum(
        jnp.maximum(
            sblo.reshape(nb, nsub, 3)[None, :, :, :]
            - rhi[:, None, None, :],
            rlo[:, None, None, :]
            - sbhi.reshape(nb, nsub, 3)[None, :, :, :],
        ),
        0.0,
    )
    # empty AABBs produce (big - -big) gaps that overflow f32 to
    # inf; inf**2 stays inf, and inf > eps2, so they cull as intended —
    # but clamp anyway so the sum never hits inf - inf NaNs.
    gap_s = jnp.minimum(gap_s, big)
    near_sub = jnp.sum(gap_s * gap_s, axis=-1) <= jnp.float32(eps2)
    submask = jnp.sum(
        near_sub.astype(jnp.int32)
        << jnp.arange(nsub, dtype=jnp.int32)[None, None, :],
        axis=-1,
    )  # [nb, nb] bit s set iff row r near col c's subtile s
    near = submask != 0
    cols = jnp.arange(nb, dtype=jnp.int32)[None, :]
    key = jnp.where(near, cols, nb + cols)
    key = jnp.sort(key, axis=1)
    ncol = jnp.where(key < nb, key, 0).astype(jnp.int32)
    ncnt = jnp.sum(near.astype(jnp.int32), axis=1)
    # number of leading blocks that can hold live cells: packed tables
    # put live rows first, but compute it as max-occupied-block + 1 so
    # callers with holes stay correct; blocks past nba are pure dead
    # capacity and the kernel initializes them with one vector write
    blk_any = jnp.any((finite | alw).reshape(nb, _BLOCK), axis=1)
    nba = jnp.max(
        jnp.where(blk_any, jnp.arange(1, nb + 1, dtype=jnp.int32), 0)
    )[None]

    # subtile culling wins only when the table is big enough that block
    # AABBs barely cull (each predicated region is a Mosaic scheduling
    # barrier: at m=4096 / 16 near pairs it COSTS ~2% end-to-end, at
    # m=32768 it saves ~5%)
    sub_cull = m >= 16384
    kernel = functools.partial(
        _kernel, m=m, max_iter=max_iter, sub_cull=sub_cull
    )
    labels, pop = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # minpts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nba
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ncnt
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ncol
            pl.BlockSpec(memory_space=pltpu.SMEM),  # submask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alive
            pl.BlockSpec(memory_space=pltpu.VMEM),  # labels0
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m,), jnp.int32),
            jax.ShapeDtypeStruct((m,), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m,), jnp.int32),  # cur labels
            pltpu.VMEM((m,), jnp.int32),  # core flags
            pltpu.VMEM((m,), jnp.int32),  # folded border labels
            pltpu.VMEM((_BLOCK,), jnp.float32),  # pop accumulator
            pltpu.VMEM((_BLOCK,), jnp.int32),    # lmin accumulator
        ],
        interpret=interpret,
    )(
        jnp.asarray([eps2], jnp.float32),
        jnp.asarray([min_points], jnp.float32),
        nba, ncnt, ncol, submask.astype(jnp.int32),
        x, y, z,
        ccount.astype(jnp.float32),
        alw.astype(jnp.int32),
        labels0.astype(jnp.int32),
    )
    return labels, pop


def cluster_cells_reference(
    centers, ccount, alive, labels0, eps2, min_points, max_iter: int | None = None
):
    """Pure-XLA oracle with identical semantics."""
    m = centers.shape[0]
    if max_iter is None:
        max_iter = m
    d2 = jnp.sum(
        (centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1
    )
    alw = alive.astype(bool)
    nbm_alive = (d2 <= eps2) & alw[None, :]
    pop = jnp.sum(jnp.where(nbm_alive, ccount[None, :], 0.0), axis=1)
    pop = jnp.where(jnp.abs(centers[:, 0]) < 1e37, pop, 0.0)
    core = alw & (pop >= min_points)
    labels = jnp.where(core, labels0, m)
    nbm_core = (d2 <= eps2) & core[None, :]

    def body(carry):
        lab, _, it = carry
        lmin = jnp.min(jnp.where(nbm_core, lab[None, :], m), axis=1)
        new = jnp.where(core, jnp.minimum(lab, lmin), lab)
        return new, jnp.any(new != lab), it + 1

    labels, _, _ = lax.while_loop(
        lambda c: c[1] & (c[2] < max_iter),
        body,
        (labels, jnp.bool_(True), jnp.int32(0)),
    )
    border = jnp.min(jnp.where(nbm_core, labels[None, :], m), axis=1)
    labels = jnp.where(core, labels, jnp.where(alw, border, m))
    return labels, pop
