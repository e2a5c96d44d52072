"""ICP-refined tower positions for correct() (opt-in --icp).

The reference's correct() writes the extracted OBB box center straight
into the GIM table (/root/reference/utils/table_match_gim.py:403-444).
A box center is a max/min midpoint: a single attached artifact (a
conductor stub, a guy wire, clinging vegetation) shifts it by half the
artifact's reach.  The north-star upgrade (BASELINE config 4) refines
each matched pair with batched point-to-point ICP: an idealized pylon
frame template — built from the tower's own box parameters — is aligned
onto the tower's actual member points with a tight correspondence
radius, so off-structure artifacts get zero weight and the refined
translation recenters the tower on its lattice, not on its outliers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pointcloudhookup_tpu.models.towers import Tower


def tower_frame_template(
    height: float,
    width: float,
    yaw: float = 0.0,
    levels: int = 14,
    per_edge: int = 5,
    taper: float = 0.7,
) -> np.ndarray:
    """Idealized tapered lattice frame, box center at the origin.

    Four corner posts plus horizontal ring braces at `levels` heights;
    the half-width tapers linearly to (1 - taper) at the top (the
    canonical transmission-pylon silhouette the extraction thresholds
    encode).  Deterministic — no RNG.  Returns f32[M,3]."""
    zs = np.linspace(0.0, 1.0, levels)
    pts = []
    for z in zs:
        half = width / 2.0 * (1.0 - taper * z)
        # ring: per_edge points per side of the square at this level
        s = np.linspace(-half, half, per_edge)
        ring = np.concatenate(
            [
                np.column_stack([s, np.full(per_edge, -half)]),
                np.column_stack([s, np.full(per_edge, half)]),
                np.column_stack([np.full(per_edge, -half), s]),
                np.column_stack([np.full(per_edge, half), s]),
            ]
        )
        pts.append(
            np.column_stack([ring, np.full(len(ring), z * height - height / 2.0)])
        )
    out = np.concatenate(pts).astype(np.float32)
    if yaw:
        c, s = np.cos(yaw), np.sin(yaw)
        out[:, :2] = out[:, :2] @ np.array([[c, s], [-s, c]], np.float32)
    return out


def refine_tower_centers(
    towers: Sequence[Tower],
    clouds: Sequence[Optional[np.ndarray]],
    pair_indices: Sequence[int],
    iters: int = 30,
    max_corr_dist: float = 2.0,
    template_params: Optional[dict] = None,
) -> dict[int, dict]:
    """Batched ICP refinement of the matched towers' positions.

    towers: all extracted towers; clouds: per-tower world-coordinate
    member points (None entries are skipped); pair_indices: the pc-side
    indices of the matched pairs.  Returns {pc_index: dict(center f64[3],
    rmse, inlier_frac, shift)} — `center` is the refined WORLD position
    of the tower's box center.

    template_params: optional {pc_index: (height, width)} overriding the
    pylon-frame geometry per pair — the GIM-model scenario (BASELINE
    config 4) derives height from the matched GIM tower's 杆塔高
    property instead of the extracted box, so the frame being aligned is
    the MODEL's geometry, not a self-template.  Either entry may be
    None to keep the extracted value.
    """
    from pointcloudhookup_tpu.ops.registration import register_tower_pairs

    idx, src, dst = [], [], []
    for pi in pair_indices:
        if pi >= len(clouds) or clouds[pi] is None or len(clouds[pi]) < 16:
            continue
        t = towers[pi]
        # default width: the SMALLER horizontal extent — a one-sided
        # artifact inflates the long axis (and thus t.width = max
        # extent) but rarely both, so ey is the robust estimate of the
        # true lattice width
        height, width = t.height, float(t.extent[1])
        if template_params and pi in template_params:
            th, tw = template_params[pi]
            height = float(th) if th else height
            width = float(tw) if tw else width
        template = tower_frame_template(height, width, yaw=t.angle)
        local = (np.asarray(clouds[pi], np.float64) - t.center).astype(np.float32)
        idx.append(pi)
        src.append(template)
        dst.append(local)
    if not idx:
        return {}
    # Coarse-to-fine correspondence radius.  The corrective force on a
    # biased initial pose comes from template points hanging OUTSIDE the
    # lattice — exactly the points a tight radius discards — so start
    # unbounded (bulk alignment), then tighten to shed artifact points.
    # Translations compose by re-basing the target between stages (R
    # stays ~identity for gravity-aligned towers).
    stages = [
        (np.inf, max(iters // 3, 5)),
        (4.0 * max_corr_dist, max(iters // 3, 5)),
        (max_corr_dist, max(iters // 3, 5)),
    ]
    shifts = [np.zeros(3) for _ in idx]
    last = None
    for radius, it in stages:
        moved = [
            (d - s).astype(np.float32) for d, s in zip(dst, shifts)
        ]
        last = register_tower_pairs(src, moved, iters=it, max_corr_dist=radius)
        for i, r in enumerate(last):
            shifts[i] = shifts[i] + np.asarray(r["t"], np.float64)
    out = {}
    for i, (pi, r) in enumerate(zip(idx, last)):
        t = towers[pi]
        # template box center sits at the template origin, so the
        # refined world center is the accumulated ICP translation
        # applied to the greedy center
        out[pi] = dict(
            center=t.center + shifts[i],
            rmse=r["rmse"],
            inlier_frac=r["inlier_frac"],
            shift=shifts[i],
        )
    return out
