"""Batched oriented-bounding-box statistics for clusters.

The reference computes a minimum-volume OBB per cluster with trimesh
(qhull convex hull — /root/reference/utils/tower_extraction.py:137-139)
and derives height = extents[2], width = max(extents[0], extents[1]),
and a north angle from the OBB x-axis (:164-177).  Convex hulls are
data-dependent and serial; on TPU we exploit that transmission towers
are gravity-aligned: the minimum-volume box of a tower is (to measurement
noise) the minimum-AREA rectangle of the XY footprint extruded over the
z extent.  That rectangle is found for ALL clusters at once by scanning
a dense grid of candidate orientations.

TPU mapping (scatter-free — TPU scatters serialize per update row):
  * points are sorted by cluster label once; per-cluster sums/counts are
    segmented-scan reductions read at segment end rows (ops/segments.py);
  * the angle scan runs in `angle_tile`-wide blocks of a lax.scan so
    peak memory is [N, angle_tile] regardless of num_angles;
  * `points_cap` optionally truncates the label-sorted buffer — cluster
    members sort to the front, so with C clustered points << N the
    angle work shrinks to [points_cap, ...]; overflow beyond the cap is
    reported in the 'overflow' output instead of silently clipping.

Angle resolution pi/2/A (A=256 -> 0.35 deg) bounds the extent error at
~0.6% of the cluster diagonal, well inside the reference's acceptance
thresholds; centroids are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from pointcloudhookup_tpu.ops.segments import boundary_flags, segmented_scan


@functools.partial(
    jax.jit,
    static_argnames=("max_clusters", "num_angles", "angle_tile", "points_cap"),
)
def cluster_obb_stats(
    xyz,
    labels,
    mask,
    *,
    max_clusters: int = 128,
    num_angles: int = 256,
    angle_tile: int = 16,
    points_cap: int | None = None,
):
    """Per-cluster gravity-aligned OBB stats.

    xyz: f32[N,3]; labels: i32[N] in [0, max_clusters) or -1; mask: bool[N].
    Returns dict of [K]-shaped arrays:
      count, centroid[K,3] (mean of member points), center[K,3] (box center),
      extent[K,3] (ex >= ey horizontal extents, ez vertical), angle (rad of
      the long horizontal axis), north_angle (deg, reference convention),
      alive (bool), plus a scalar 'overflow' count of clustered points
      beyond points_cap (0 when everything was measured).
    """
    n = xyz.shape[0]
    k = max_clusters
    if num_angles % angle_tile:
        raise ValueError("num_angles must be a multiple of angle_tile")
    big = jnp.float32(3.0e38)
    valid = (labels >= 0) & (labels < k) & mask
    lab = jnp.where(valid, labels, k).astype(jnp.int32)

    # ---- sort by label, carrying coordinates as payloads (row gathers
    # are far more expensive than extra sort operands on TPU); cluster
    # members land at the front
    lab_s, sx, sy, sz = lax.sort(
        (lab, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1
    )
    xyz_s = jnp.stack([sx, sy, sz], axis=1)
    w = (lab_s < k).astype(jnp.float32)
    is_start = boundary_flags(lab_s)

    # per-cluster first/last rows
    ar = jnp.arange(k, dtype=jnp.int32)
    ends = jnp.searchsorted(lab_s, ar, side="right").astype(jnp.int32) - 1
    lefts = jnp.searchsorted(lab_s, ar, side="left").astype(jnp.int32)
    alive = ends >= lefts
    ce = jnp.clip(ends, 0, n - 1)
    cl = jnp.clip(lefts, 0, n - 1)

    # ---- counts / centroids: reverse segmented scan puts each
    # cluster's totals on its first row; read K rows (tiny gather)
    vals = jnp.concatenate([xyz_s * w[:, None], w[:, None]], axis=1)
    totals = segmented_scan(jnp.add, vals, is_start, reverse=True)
    counts = jnp.where(alive, totals[cl, 3], 0.0)
    centroid = jnp.where(
        alive[:, None], totals[cl, :3] / jnp.maximum(counts, 1.0)[:, None], 0.0
    )

    # ---- truncate for the angle scan (members are at the front)
    cap = n if points_cap is None else min(points_cap, n)
    total_members = jnp.sum(w)
    overflow = jnp.maximum(total_members - cap, 0.0)
    xs = xyz_s[:cap]
    vs = (lab_s[:cap] < k)
    is_start_c = is_start[:cap]
    ce_c = jnp.clip(ends, 0, cap - 1)

    # ---- tiled angle scan for the min-area XY rectangle
    xy = xs[:, :2]
    n_tiles = num_angles // angle_tile

    def angle_body(_, t):
        a = (t * angle_tile + jnp.arange(angle_tile, dtype=jnp.float32)) * (
            jnp.pi / 2.0 / num_angles
        )
        du = jnp.stack([jnp.cos(a), jnp.sin(a)])  # [2, At]
        dv = jnp.stack([-jnp.sin(a), jnp.cos(a)])
        # full f32: reduced-precision dots quantize the projections by
        # ~0.3 m at corridor scales, inflating fitted extents
        pu = jnp.dot(xy, du, precision=jax.lax.Precision.HIGHEST)
        pv = jnp.dot(xy, dv, precision=jax.lax.Precision.HIGHEST)
        pu_hi = segmented_scan(
            jnp.maximum, jnp.where(vs[:, None], pu, -big), is_start_c
        )[ce_c]
        pu_lo = segmented_scan(
            jnp.minimum, jnp.where(vs[:, None], pu, big), is_start_c
        )[ce_c]
        pv_hi = segmented_scan(
            jnp.maximum, jnp.where(vs[:, None], pv, -big), is_start_c
        )[ce_c]
        pv_lo = segmented_scan(
            jnp.minimum, jnp.where(vs[:, None], pv, big), is_start_c
        )[ce_c]
        return None, (pu_hi - pu_lo, pv_hi - pv_lo, pu_hi + pu_lo, pv_hi + pv_lo)

    _, (eu_t, ev_t, su_t, sv_t) = lax.scan(
        angle_body, None, jnp.arange(n_tiles)
    )  # each [T, K, At]

    def flat(x):  # [T, K, At] -> [K, A]
        return jnp.moveaxis(x, 0, 1).reshape(k, num_angles)

    eu, ev, su, sv = flat(eu_t), flat(ev_t), flat(su_t), flat(sv_t)
    area = eu * ev
    best = jnp.argmin(area, axis=1)
    eu_b = eu[ar, best]
    ev_b = ev[ar, best]
    cu = su[ar, best] * 0.5
    cv = sv[ar, best] * 0.5
    theta = best.astype(jnp.float32) * (jnp.pi / 2.0 / num_angles)
    u_vec = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)
    v_vec = jnp.stack([-jnp.sin(theta), jnp.cos(theta)], axis=1)
    center_xy = cu[:, None] * u_vec + cv[:, None] * v_vec

    # ---- z extent (same segmented machinery, single column)
    z = xs[:, 2]
    z_hi = segmented_scan(jnp.maximum, jnp.where(vs, z, -big), is_start_c)[ce_c]
    z_lo = segmented_scan(jnp.minimum, jnp.where(vs, z, big), is_start_c)[ce_c]
    ez = z_hi - z_lo
    center = jnp.concatenate([center_xy, ((z_hi + z_lo) * 0.5)[:, None]], axis=1)

    # ---- canonical horizontal axes: x-axis = longer horizontal extent
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
        centroid=centroid,
        center=jnp.where(alive[:, None], center, zero3),
        extent=jnp.where(alive[:, None], jnp.stack([ex, ey, ez], axis=1), zero3),
        angle=jnp.where(alive, theta + swap * (jnp.pi / 2.0), 0.0),
        north_angle=jnp.where(alive, north, 0.0),
        overflow=overflow,
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
