"""Sort-free per-cluster OBB accumulation kernel.

The sort-based OBB (`ops/obb.py::cluster_obb_stats_codes`) pays a
full-N label sort (~45% of the whole extraction iteration at 4M rows)
just to make cluster members contiguous.  This kernel removes that
sort: rows arrive in the front-end's Morton order, where cluster labels
are piecewise-constant over cell runs and therefore SPATIALLY LOCAL —
each 1024-row block touches at most a handful of labels, and blocks
with no labels at all (the ground, ~85-90% of a corridor tile) are
skipped from a precomputed per-block label range.

One sequential pass over row blocks accumulates, in VMEM scratch:

  * count / Σx / Σy / Σz / zmin / zmax per cluster      [1, K] each
  * rotating-rectangle projection extremes umin/umax/vmin/vmax
    per (cluster, angle) over a flat A-angle grid        [K, A] each

Rows decode from Morton codes in-kernel (pure i32 bit ops on the VPU);
accumulator updates are one-hot masked whole-array combines — no
dynamic-index stores, no atomics, no scatters.  Angle 0 projects onto
(x, y), so the axis-aligned bounds fall out of column 0 for free.

Worst case is a block whose label range spans many clusters; labels are
assigned in Morton order by `compact_labels`, so ranges stay tight in
practice, and labels absent from the block cost one masked reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _decode_axis(hi, lo, shift):
    """_compact10(lo>>shift) | (_compact10(hi>>shift) << 10), inlined
    from ops/morton.py (pure i32 bit ops, VPU-friendly)."""

    def compact10(x):
        x = x & 0x09249249
        x = (x | (x >> 2)) & 0x030C30C3
        x = (x | (x >> 4)) & 0x0300F00F
        x = (x | (x >> 8)) & 0x030000FF
        x = (x | (x >> 16)) & 0x3FF
        return x

    return compact10(lo >> shift) | (compact10(hi >> shift) << 10)


def _init_scratch(cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s, ulo_s, uhi_s,
                  vlo_s, vhi_s):
    big = jnp.float32(_BIG)
    cnt_s[:] = jnp.zeros_like(cnt_s)
    sx_s[:] = jnp.zeros_like(sx_s)
    sy_s[:] = jnp.zeros_like(sy_s)
    sz_s[:] = jnp.zeros_like(sz_s)
    zlo_s[:] = jnp.full_like(zlo_s, big)
    zhi_s[:] = jnp.full_like(zhi_s, -big)
    ulo_s[:] = jnp.full_like(ulo_s, big)
    uhi_s[:] = jnp.full_like(uhi_s, -big)
    vlo_s[:] = jnp.full_like(vlo_s, big)
    vhi_s[:] = jnp.full_like(vhi_s, -big)


def _accum_block(
    x, y, z, lab, cos_a, sin_a, lmin, lmax,
    cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s, ulo_s, uhi_s, vlo_s, vhi_s,
    *, k: int,
):
    """Accumulate one block's per-cluster stats into the VMEM scratch
    (shared by the Morton-decode and raw-xyz kernels)."""
    big = jnp.float32(_BIG)
    x2 = x[:, None]  # 32-bit minor-dim inserts only (Mosaic cannot
    y2 = y[:, None]  # reshape i1 vectors, so masks are built in 2-D)
    z2 = z[:, None]
    lab2 = lab[:, None]  # [B, 1] i32
    u = x2 * cos_a + y2 * sin_a  # [B, A]
    v = y2 * cos_a - x2 * sin_a
    lane_k = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    row_k = lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def body(c, _):
        m2 = lab2 == c  # [B, 1]
        @pl.when(jnp.any(m2))
        def _acc():
            mf = m2.astype(jnp.float32)
            oh = lane_k == c  # [1, K]
            cnt_s[:] = cnt_s[:] + jnp.where(oh, jnp.sum(mf), 0.0)
            sx_s[:] = sx_s[:] + jnp.where(oh, jnp.sum(x2 * mf), 0.0)
            sy_s[:] = sy_s[:] + jnp.where(oh, jnp.sum(y2 * mf), 0.0)
            sz_s[:] = sz_s[:] + jnp.where(oh, jnp.sum(z2 * mf), 0.0)
            zlo_s[:] = jnp.where(
                oh, jnp.minimum(zlo_s[:], jnp.min(jnp.where(m2, z2, big))), zlo_s[:]
            )
            zhi_s[:] = jnp.where(
                oh, jnp.maximum(zhi_s[:], jnp.max(jnp.where(m2, z2, -big))), zhi_s[:]
            )
            u_lo = jnp.min(jnp.where(m2, u, big), axis=0)[None, :]  # [1, A]
            u_hi = jnp.max(jnp.where(m2, u, -big), axis=0)[None, :]
            v_lo = jnp.min(jnp.where(m2, v, big), axis=0)[None, :]
            v_hi = jnp.max(jnp.where(m2, v, -big), axis=0)[None, :]
            ohr = row_k == c  # [K, 1]
            ulo_s[:] = jnp.where(ohr, jnp.minimum(ulo_s[:], u_lo), ulo_s[:])
            uhi_s[:] = jnp.where(ohr, jnp.maximum(uhi_s[:], u_hi), uhi_s[:])
            vlo_s[:] = jnp.where(ohr, jnp.minimum(vlo_s[:], v_lo), vlo_s[:])
            vhi_s[:] = jnp.where(ohr, jnp.maximum(vhi_s[:], v_hi), vhi_s[:])
        return _

    lax.fori_loop(lmin, lmax + 1, body, 0)


def _kernel(
    lmin_ref, lmax_ref, off_ref,  # SMEM: per-block label range, xyz offsets
    hi_ref, lo_ref, lab_ref, cos_ref, sin_ref,  # VMEM blocks / tables
    cnt_o, sx_o, sy_o, sz_o, zlo_o, zhi_o, ulo_o, uhi_o, vlo_o, vhi_o,
    cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s, ulo_s, uhi_s, vlo_s, vhi_s,
    *, voxel_size: float, k: int, a: int,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        _init_scratch(cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s,
                      ulo_s, uhi_s, vlo_s, vhi_s)

    lmin = lmin_ref[i]
    lmax = lmax_ref[i]

    @pl.when(lmax >= 0)
    def _process():
        hi = hi_ref[:]
        lo = lo_ref[:]
        vs = jnp.float32(voxel_size)
        x = _decode_axis(hi, lo, 0).astype(jnp.float32) * vs + off_ref[0]
        y = _decode_axis(hi, lo, 1).astype(jnp.float32) * vs + off_ref[1]
        z = _decode_axis(hi, lo, 2).astype(jnp.float32) * vs + off_ref[2]
        _accum_block(
            x, y, z, lab_ref[:], cos_ref[:], sin_ref[:], lmin, lmax,
            cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s, ulo_s, uhi_s,
            vlo_s, vhi_s, k=k,
        )

    @pl.when(i == nb - 1)
    def _emit():
        cnt_o[:] = cnt_s[:]
        sx_o[:] = sx_s[:]
        sy_o[:] = sy_s[:]
        sz_o[:] = sz_s[:]
        zlo_o[:] = zlo_s[:]
        zhi_o[:] = zhi_s[:]
        ulo_o[:] = ulo_s[:]
        uhi_o[:] = uhi_s[:]
        vlo_o[:] = vlo_s[:]
        vhi_o[:] = vhi_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "max_clusters", "num_angles", "block", "interpret"),
)
def obb_accumulate(
    hi,
    lo,
    labels,
    mn,
    *,
    voxel_size: float = 0.1,
    max_clusters: int = 128,
    num_angles: int = 256,
    block: int = 1024,
    interpret: bool = False,
):
    """Accumulate per-cluster OBB statistics over Morton-coded rows.

    hi/lo: i32[N] Morton codes (any order, spatial locality helps);
    labels: i32[N], cluster id in [0, K) or negative for rows to skip
    (ground / padding / noise); mn: f32[3] grid origin.

    Returns dict(cnt[K], sx[K], sy[K], sz[K], zlo[K], zhi[K],
    ulo[K,A], uhi[K,A], vlo[K,A], vhi[K,A]) where (u, v) are the
    rotated-frame projections at angle_j = j*(pi/2)/A; column 0 is the
    axis-aligned frame.
    """
    n = hi.shape[0]
    k = max_clusters
    a = num_angles
    if n % block:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    nb = n // block
    lab = jnp.where(labels < k, labels, -1).astype(jnp.int32)
    lab2 = lab.reshape(nb, block)
    blk_lmax = jnp.max(lab2, axis=1).astype(jnp.int32)
    blk_lmin = jnp.min(jnp.where(lab2 >= 0, lab2, k), axis=1).astype(jnp.int32)
    ang = (jnp.arange(a, dtype=jnp.float32) * (jnp.pi / 2.0 / a))[None, :]
    cos_a = jnp.cos(ang)
    sin_a = jnp.sin(ang)
    half = jnp.float32(voxel_size) * 0.5
    off = (mn + half).astype(jnp.float32)

    fk = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((1, k), fk),  # cnt
        jax.ShapeDtypeStruct((1, k), fk),  # sx
        jax.ShapeDtypeStruct((1, k), fk),  # sy
        jax.ShapeDtypeStruct((1, k), fk),  # sz
        jax.ShapeDtypeStruct((1, k), fk),  # zlo
        jax.ShapeDtypeStruct((1, k), fk),  # zhi
        jax.ShapeDtypeStruct((k, a), fk),  # ulo
        jax.ShapeDtypeStruct((k, a), fk),  # uhi
        jax.ShapeDtypeStruct((k, a), fk),  # vlo
        jax.ShapeDtypeStruct((k, a), fk),  # vhi
    ]
    kernel = functools.partial(_kernel, voxel_size=voxel_size, k=k, a=a)
    const_map = lambda i: (0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lmin [nb]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lmax [nb]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # off [3]
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),  # hi
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),  # lo
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),  # lab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos [1, A]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin
        ],
        out_specs=[
            pl.BlockSpec(s.shape, const_map, memory_space=pltpu.VMEM)
            for s in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, k), fk), pltpu.VMEM((1, k), fk),
            pltpu.VMEM((1, k), fk), pltpu.VMEM((1, k), fk),
            pltpu.VMEM((1, k), fk), pltpu.VMEM((1, k), fk),
            pltpu.VMEM((k, a), fk), pltpu.VMEM((k, a), fk),
            pltpu.VMEM((k, a), fk), pltpu.VMEM((k, a), fk),
        ],
        interpret=interpret,
    )(blk_lmin, blk_lmax, off, hi, lo, lab, cos_a, sin_a)
    names = ("cnt", "sx", "sy", "sz", "zlo", "zhi", "ulo", "uhi", "vlo", "vhi")
    out = dict(zip(names, outs))
    for key in ("cnt", "sx", "sy", "sz", "zlo", "zhi"):
        out[key] = out[key][0]
    return out


def _kernel_xyz(
    lmin_ref, lmax_ref,  # SMEM: per-block label range
    x_ref, y_ref, z_ref, lab_ref, cos_ref, sin_ref,  # VMEM blocks / tables
    cnt_o, sx_o, sy_o, sz_o, zlo_o, zhi_o, ulo_o, uhi_o, vlo_o, vhi_o,
    cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s, ulo_s, uhi_s, vlo_s, vhi_s,
    *, k: int, a: int,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        _init_scratch(cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s,
                      ulo_s, uhi_s, vlo_s, vhi_s)

    lmin = lmin_ref[i]
    lmax = lmax_ref[i]

    @pl.when(lmax >= 0)
    def _process():
        _accum_block(
            x_ref[:], y_ref[:], z_ref[:], lab_ref[:], cos_ref[:],
            sin_ref[:], lmin, lmax,
            cnt_s, sx_s, sy_s, sz_s, zlo_s, zhi_s, ulo_s, uhi_s,
            vlo_s, vhi_s, k=k,
        )

    @pl.when(i == nb - 1)
    def _emit():
        cnt_o[:] = cnt_s[:]
        sx_o[:] = sx_s[:]
        sy_o[:] = sy_s[:]
        sz_o[:] = sz_s[:]
        zlo_o[:] = zlo_s[:]
        zhi_o[:] = zhi_s[:]
        ulo_o[:] = ulo_s[:]
        uhi_o[:] = uhi_s[:]
        vlo_o[:] = vlo_s[:]
        vhi_o[:] = vhi_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("max_clusters", "num_angles", "block", "interpret"),
)
def obb_accumulate_xyz(
    x,
    y,
    z,
    labels,
    *,
    max_clusters: int = 128,
    num_angles: int = 256,
    block: int = 1024,
    interpret: bool = False,
):
    """obb_accumulate over RAW f32 coordinates (the exact-semantics
    path: positions are real points, not voxel lattice sites, so there
    is no Morton code to decode from).  x/y/z: f32[N]; labels: i32[N],
    id in [0, K) or negative to skip.  Same return contract as
    obb_accumulate."""
    n = x.shape[0]
    k = max_clusters
    a = num_angles
    if n % block:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    nb = n // block
    lab = jnp.where(labels < k, labels, -1).astype(jnp.int32)
    lab2 = lab.reshape(nb, block)
    blk_lmax = jnp.max(lab2, axis=1).astype(jnp.int32)
    blk_lmin = jnp.min(jnp.where(lab2 >= 0, lab2, k), axis=1).astype(jnp.int32)
    ang = (jnp.arange(a, dtype=jnp.float32) * (jnp.pi / 2.0 / a))[None, :]
    cos_a = jnp.cos(ang)
    sin_a = jnp.sin(ang)

    fk = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((1, k), fk),  # cnt
        jax.ShapeDtypeStruct((1, k), fk),  # sx
        jax.ShapeDtypeStruct((1, k), fk),  # sy
        jax.ShapeDtypeStruct((1, k), fk),  # sz
        jax.ShapeDtypeStruct((1, k), fk),  # zlo
        jax.ShapeDtypeStruct((1, k), fk),  # zhi
        jax.ShapeDtypeStruct((k, a), fk),  # ulo
        jax.ShapeDtypeStruct((k, a), fk),  # uhi
        jax.ShapeDtypeStruct((k, a), fk),  # vlo
        jax.ShapeDtypeStruct((k, a), fk),  # vhi
    ]
    kernel = functools.partial(_kernel_xyz, k=k, a=a)
    const_map = lambda i: (0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lmin [nb]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lmax [nb]
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),  # y
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),  # z
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),  # lab
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos [1, A]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin
        ],
        out_specs=[
            pl.BlockSpec(s.shape, const_map, memory_space=pltpu.VMEM)
            for s in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, k), fk), pltpu.VMEM((1, k), fk),
            pltpu.VMEM((1, k), fk), pltpu.VMEM((1, k), fk),
            pltpu.VMEM((1, k), fk), pltpu.VMEM((1, k), fk),
            pltpu.VMEM((k, a), fk), pltpu.VMEM((k, a), fk),
            pltpu.VMEM((k, a), fk), pltpu.VMEM((k, a), fk),
        ],
        interpret=interpret,
    )(blk_lmin, blk_lmax, x.astype(jnp.float32), y.astype(jnp.float32),
      z.astype(jnp.float32), lab, cos_a, sin_a)
    names = ("cnt", "sx", "sy", "sz", "zlo", "zhi", "ulo", "uhi", "vlo", "vhi")
    out = dict(zip(names, outs))
    for key in ("cnt", "sx", "sy", "sz", "zlo", "zhi"):
        out[key] = out[key][0]
    return out


def obb_accumulate_xyz_reference(
    x, y, z, labels, *, max_clusters=128, num_angles=256
):
    """Pure-XLA oracle for obb_accumulate_xyz (dense one-hot; test sizes
    only)."""
    k = max_clusters
    a = num_angles
    big = jnp.float32(_BIG)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    z = z.astype(jnp.float32)
    lab = jnp.where(labels < k, labels, -1)
    oh = lab[:, None] == jnp.arange(k)[None, :]  # [N, K]
    ohf = oh.astype(jnp.float32)
    ang = jnp.arange(a, dtype=jnp.float32) * (jnp.pi / 2.0 / a)
    u = x[:, None] * jnp.cos(ang)[None, :] + y[:, None] * jnp.sin(ang)[None, :]
    v = y[:, None] * jnp.cos(ang)[None, :] - x[:, None] * jnp.sin(ang)[None, :]

    def seg_min(w):  # [N, A] -> [K, A]
        return jnp.min(
            jnp.where(oh[:, :, None], w[:, None, :], big), axis=0
        )

    def seg_max(w):
        return jnp.max(
            jnp.where(oh[:, :, None], w[:, None, :], -big), axis=0
        )

    return dict(
        cnt=jnp.sum(ohf, axis=0),
        sx=jnp.sum(x[:, None] * ohf, axis=0),
        sy=jnp.sum(y[:, None] * ohf, axis=0),
        sz=jnp.sum(z[:, None] * ohf, axis=0),
        zlo=jnp.min(jnp.where(oh, z[:, None], big), axis=0),
        zhi=jnp.max(jnp.where(oh, z[:, None], -big), axis=0),
        ulo=seg_min(u),
        uhi=seg_max(u),
        vlo=seg_min(v),
        vhi=seg_max(v),
    )


def obb_accumulate_reference(
    hi, lo, labels, mn, *, voxel_size=0.1, max_clusters=128, num_angles=256
):
    """Pure-XLA oracle (dense one-hot; test sizes only)."""
    from pointcloudhookup_tpu.ops.morton import morton_decode

    k = max_clusters
    a = num_angles
    big = jnp.float32(_BIG)
    ix, iy, iz = morton_decode(hi, lo)
    half = jnp.float32(voxel_size) * 0.5
    x = ix.astype(jnp.float32) * voxel_size + mn[0] + half
    y = iy.astype(jnp.float32) * voxel_size + mn[1] + half
    z = iz.astype(jnp.float32) * voxel_size + mn[2] + half
    lab = jnp.where(labels < k, labels, -1)
    oh = lab[:, None] == jnp.arange(k)[None, :]  # [N, K]
    ohf = oh.astype(jnp.float32)
    ang = jnp.arange(a, dtype=jnp.float32) * (jnp.pi / 2.0 / a)
    u = x[:, None] * jnp.cos(ang)[None, :] + y[:, None] * jnp.sin(ang)[None, :]
    v = y[:, None] * jnp.cos(ang)[None, :] - x[:, None] * jnp.sin(ang)[None, :]

    def seg_min(w):  # [N, A] -> [K, A]
        return jnp.min(
            jnp.where(oh[:, :, None], w[:, None, :], big), axis=0
        )

    def seg_max(w):
        return jnp.max(
            jnp.where(oh[:, :, None], w[:, None, :], -big), axis=0
        )

    return dict(
        cnt=jnp.sum(ohf, axis=0),
        sx=jnp.sum(x[:, None] * ohf, axis=0),
        sy=jnp.sum(y[:, None] * ohf, axis=0),
        sz=jnp.sum(z[:, None] * ohf, axis=0),
        zlo=jnp.min(jnp.where(oh, z[:, None], big), axis=0),
        zhi=jnp.max(jnp.where(oh, z[:, None], -big), axis=0),
        ulo=seg_min(u),
        uhi=seg_max(u),
        vlo=seg_min(v),
        vhi=seg_max(v),
    )
