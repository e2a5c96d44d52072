"""Generate tests/fixtures/obb_goldens.json — minimum-volume OBB
goldens for the fixture clusters used by tests/test_obb_goldens.py.

trimesh itself is not installable in this environment, so the oracle
here is an independent implementation of the SAME published algorithm
trimesh.bounds.oriented_bounds uses (and the reference relies on via
`mesh.bounding_box_oriented`, /root/reference/utils/tower_extraction.py:137-146):

  for every face normal n of the 3D convex hull (qhull):
      rotate n to +z, project the hull vertices to the normal plane,
      find the minimum-AREA rectangle of the 2D projection by rotating
      calipers over the 2D hull edges,
      candidate volume = rect area * extent along n;
  the minimum-volume candidate wins.

This is exact whenever the optimal box has a face flush with a hull
face (O'Rourke), which is trimesh's operating assumption too — so
matching these goldens IS matching trimesh to its own accuracy.

Run: python tests/fixtures/make_obb_goldens.py   (rewrites the JSON)
"""

import json
import os

import numpy as np
from scipy.spatial import ConvexHull


def min_area_rect_2d(xy):
    """Rotating calipers over 2D hull edges: (area, eu, ev, theta)."""
    hull = xy[ConvexHull(xy).vertices]
    edges = np.roll(hull, -1, axis=0) - hull
    thetas = np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2)
    best = (np.inf, 0.0, 0.0, 0.0)
    for t in np.unique(thetas):
        c, s = np.cos(t), np.sin(t)
        u = hull @ np.array([c, s])
        v = hull @ np.array([-s, c])
        eu = u.max() - u.min()
        ev = v.max() - v.min()
        if eu * ev < best[0]:
            best = (eu * ev, eu, ev, t)
    return best


def min_volume_obb(points):
    """Hull-face-normal sweep (the trimesh oriented_bounds algorithm).

    Returns dict(volume, extents sorted desc, center)."""
    hull3 = ConvexHull(points)
    verts = points[hull3.vertices]
    # unique face normals (dedup antipodal + repeated within tolerance)
    normals = hull3.equations[:, :3]
    normals = normals / np.linalg.norm(normals, axis=1, keepdims=True)
    canon = normals * np.where(
        (np.abs(normals).argmax(axis=1) >= 0)
        & (np.take_along_axis(
            normals, np.abs(normals).argmax(axis=1)[:, None], axis=1
        ).ravel() < 0),
        -1.0,
        1.0,
    )[:, None]
    _, keep = np.unique(np.round(canon, 6), axis=0, return_index=True)
    best = None
    for n in normals[keep]:
        # orthonormal basis with n as w
        a = np.array([1.0, 0.0, 0.0])
        if abs(n @ a) > 0.9:
            a = np.array([0.0, 1.0, 0.0])
        u = np.cross(n, a)
        u /= np.linalg.norm(u)
        v = np.cross(n, u)
        P2 = np.column_stack([verts @ u, verts @ v])
        area, eu, ev, t = min_area_rect_2d(P2)
        w = verts @ n
        ew = w.max() - w.min()
        vol = area * ew
        if best is None or vol < best["volume"]:
            c, s = np.cos(t), np.sin(t)
            axis_u = c * u + s * v
            axis_v = -s * u + c * v
            pu = P2 @ np.array([c, s])
            pv = P2 @ np.array([-s, c])
            cu = (pu.max() + pu.min()) / 2
            cv = (pv.max() + pv.min()) / 2
            cw = (w.max() + w.min()) / 2
            center = cu * axis_u + cv * axis_v + cw * n
            best = dict(
                volume=float(vol),
                extents=sorted([float(eu), float(ev), float(ew)], reverse=True),
                center=[float(x) for x in center],
            )
    return best


def fixture_clusters():
    """Deterministic tower-like clusters (the shapes the parity claim is
    about).  Must stay in sync with tests/test_obb_goldens.py."""
    rng = np.random.default_rng(42)
    out = {}

    def lattice(name, cx, cy, width, height, yaw_deg, n=3000, taper=0.7):
        t = rng.uniform(0, 1, n)
        half = width / 2 * (1.0 - taper * t)
        x = rng.uniform(-1, 1, n) * half
        y = rng.uniform(-1, 1, n) * half
        z = t * height
        pts = np.column_stack([x, y, z])
        c, s = np.cos(np.radians(yaw_deg)), np.sin(np.radians(yaw_deg))
        pts[:, :2] = pts[:, :2] @ np.array([[c, s], [-s, c]])
        pts[:, 0] += cx
        pts[:, 1] += cy
        out[name] = pts

    lattice("tower_axis_aligned", 0, 0, 12.0, 35.0, 0.0)
    lattice("tower_rot30", 50, 20, 12.0, 35.0, 30.0)
    lattice("tower_rot75", -40, 10, 10.0, 28.0, 75.0)
    lattice("tower_wide", 10, -60, 22.0, 40.0, 12.0, taper=0.3)
    lattice("tower_slender", 80, 80, 6.0, 45.0, 55.0, taper=0.8)

    # rectangular slab (building-like reject candidate)
    n = 2500
    pts = np.column_stack([
        rng.uniform(-15, 15, n), rng.uniform(-6, 6, n), rng.uniform(0, 9, n)
    ])
    c, s = np.cos(np.radians(20)), np.sin(np.radians(20))
    pts[:, :2] = pts[:, :2] @ np.array([[c, s], [-s, c]])
    out["slab_rot20"] = pts

    # dense cube with noise
    out["cube"] = rng.uniform(-8, 8, (2000, 3))

    # elongated thin wall at an angle
    n = 2200
    pts = np.column_stack([
        rng.uniform(-25, 25, n), rng.normal(0, 0.4, n), rng.uniform(0, 12, n)
    ])
    c, s = np.cos(np.radians(-35)), np.sin(np.radians(-35))
    pts[:, :2] = pts[:, :2] @ np.array([[c, s], [-s, c]])
    out["wall_rot35"] = pts

    # two-deck tower (crossarms): union of slender column + top slab
    col = np.column_stack([
        rng.uniform(-3, 3, 1800), rng.uniform(-3, 3, 1800),
        rng.uniform(0, 30, 1800),
    ])
    arm = np.column_stack([
        rng.uniform(-10, 10, 700), rng.uniform(-1.5, 1.5, 700),
        rng.uniform(26, 30, 700),
    ])
    pts = np.vstack([col, arm])
    c, s = np.cos(np.radians(40)), np.sin(np.radians(40))
    pts[:, :2] = pts[:, :2] @ np.array([[c, s], [-s, c]])
    out["tower_crossarm_rot40"] = pts

    # tilted plane-ish scatter (stress: min box NOT z-aligned) — used to
    # DOCUMENT the gravity-aligned approximation's behavior, not parity
    n = 1500
    u = rng.uniform(-12, 12, n)
    v = rng.uniform(-10, 10, n)
    w = rng.normal(0, 0.5, n)
    tilt = np.radians(18)
    pts = np.column_stack([
        u,
        v * np.cos(tilt) - w * np.sin(tilt),
        v * np.sin(tilt) + w * np.cos(tilt) + 8.0,
    ])
    out["tilted_sheet"] = pts
    return out


def main():
    goldens = {}
    for name, pts in fixture_clusters().items():
        goldens[name] = min_volume_obb(pts)
        print(name, goldens[name]["volume"], goldens[name]["extents"])
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "obb_goldens.json")
    with open(path, "w") as f:
        json.dump(goldens, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
