"""Batched oriented-bounding-box statistics for clusters.

The reference computes a minimum-volume OBB per cluster with trimesh
(qhull convex hull — /root/reference/utils/tower_extraction.py:137-139)
and derives height = extents[2], width = max(extents[0], extents[1]),
and a north angle from the OBB x-axis (:164-177).  Convex hulls are
data-dependent and serial; on TPU we exploit that transmission towers
are gravity-aligned: the minimum-volume box of a tower is (to measurement
noise) the minimum-AREA rectangle of the XY footprint extruded over the
z extent.  We find that rectangle for ALL clusters at once by scanning a
dense grid of candidate orientations — two [N,2]x[2,A] matmuls plus
segment min/max reductions, fully MXU/VPU friendly, no data-dependent
shapes.

Angle resolution pi/2/A (A=256 -> 0.35 deg) bounds the extent error at
~0.6% of the cluster diagonal, well inside the reference's acceptance
thresholds; centroids are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_clusters", "num_angles"))
def cluster_obb_stats(xyz, labels, mask, *, max_clusters: int = 128, num_angles: int = 256):
    """Per-cluster gravity-aligned OBB stats.

    xyz: f32[N,3]; labels: i32[N] in [0, max_clusters) or -1; mask: bool[N].
    Returns dict of [K]-shaped arrays:
      count, centroid[K,3] (mean of member points), center[K,3] (box center),
      extent[K,3] (ex >= ey horizontal extents, ez vertical), angle (rad of
      the long horizontal axis), north_angle (deg, reference convention),
      alive (bool).
    """
    k = max_clusters
    n = xyz.shape[0]
    valid = (labels >= 0) & (labels < k) & mask
    seg = jnp.where(valid, labels, k)
    w = valid.astype(jnp.float32)

    counts = jax.ops.segment_sum(w, seg, num_segments=k + 1)[:k]
    alive = counts > 0
    sums = jax.ops.segment_sum(xyz * w[:, None], seg, num_segments=k + 1)[:k]
    centroid = sums / jnp.maximum(counts, 1.0)[:, None]

    big = jnp.float32(3.0e38)
    # --- angle scan for the min-area XY rectangle
    a = jnp.arange(num_angles, dtype=jnp.float32) * (jnp.pi / 2.0 / num_angles)
    du = jnp.stack([jnp.cos(a), jnp.sin(a)])  # [2, A]
    dv = jnp.stack([-jnp.sin(a), jnp.cos(a)])  # [2, A]
    xy = xyz[:, :2]
    # full f32: reduced-precision dots quantize the projections by ~0.3 m
    # at corridor scales, inflating the fitted extents
    pu = jnp.dot(xy, du, precision=jax.lax.Precision.HIGHEST)  # [N, A]
    pv = jnp.dot(xy, dv, precision=jax.lax.Precision.HIGHEST)
    pu_hi = jax.ops.segment_max(jnp.where(valid[:, None], pu, -big), seg, num_segments=k + 1)[:k]
    pu_lo = -jax.ops.segment_max(jnp.where(valid[:, None], -pu, -big), seg, num_segments=k + 1)[:k]
    pv_hi = jax.ops.segment_max(jnp.where(valid[:, None], pv, -big), seg, num_segments=k + 1)[:k]
    pv_lo = -jax.ops.segment_max(jnp.where(valid[:, None], -pv, -big), seg, num_segments=k + 1)[:k]
    eu = pu_hi - pu_lo  # [K, A]
    ev = pv_hi - pv_lo
    area = eu * ev
    best = jnp.argmin(area, axis=1)  # [K]
    ar = jnp.arange(k)
    eu_b, ev_b = eu[ar, best], ev[ar, best]
    cu = (pu_hi[ar, best] + pu_lo[ar, best]) * 0.5
    cv = (pv_hi[ar, best] + pv_lo[ar, best]) * 0.5
    theta = a[best]
    u_vec = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)  # [K,2]
    v_vec = jnp.stack([-jnp.sin(theta), jnp.cos(theta)], axis=1)
    center_xy = cu[:, None] * u_vec + cv[:, None] * v_vec

    # --- z extent
    z = xyz[:, 2]
    z_hi = jax.ops.segment_max(jnp.where(valid, z, -big), seg, num_segments=k + 1)[:k]
    z_lo = -jax.ops.segment_max(jnp.where(valid, -z, -big), seg, num_segments=k + 1)[:k]
    ez = z_hi - z_lo
    center = jnp.concatenate([center_xy, ((z_hi + z_lo) * 0.5)[:, None]], axis=1)

    # --- canonical horizontal axes: x-axis = longer horizontal extent
    # (the variant the reference converged on for the north angle:
    # /root/reference/test/pipei.py:300-336 projects onto the longest
    # horizontal axis).
    swap = ev_b > eu_b
    ex = jnp.where(swap, ev_b, eu_b)
    ey = jnp.where(swap, eu_b, ev_b)
    axis = jnp.where(swap[:, None], v_vec, u_vec)
    # north angle convention (ref: utils/tower_extraction.py:173-177):
    # (90 - atan2(y, x) in degrees) mod 360.
    ang_deg = jnp.degrees(jnp.arctan2(axis[:, 1], axis[:, 0]))
    north = jnp.mod(90.0 - ang_deg, 360.0)

    zero3 = jnp.zeros((k, 3), jnp.float32)
    return dict(
        count=counts,
        alive=alive,
        centroid=jnp.where(alive[:, None], centroid, zero3),
        center=jnp.where(alive[:, None], center, zero3),
        extent=jnp.where(
            alive[:, None], jnp.stack([ex, ey, ez], axis=1), zero3
        ),
        angle=jnp.where(alive, theta + swap * (jnp.pi / 2.0), 0.0),
        north_angle=jnp.where(alive, north, 0.0),
    )


def min_area_rect_numpy(xy):
    """Host oracle: exact min-area rectangle via convex-hull rotating
    calipers (scipy).  Returns (area, (eu, ev))."""
    import numpy as np
    from scipy.spatial import ConvexHull

    hull = xy[ConvexHull(xy).vertices]
    edges = np.roll(hull, -1, axis=0) - hull
    thetas = np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2)
    best = (np.inf, (0.0, 0.0))
    for t in thetas:
        c, s = np.cos(t), np.sin(t)
        u = xy @ np.array([c, s])
        v = xy @ np.array([-s, c])
        eu = u.max() - u.min()
        ev = v.max() - v.min()
        if eu * ev < best[0]:
            best = (eu * ev, (eu, ev))
    return best
