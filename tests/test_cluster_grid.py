import numpy as np
import jax.numpy as jnp

from pointcloudhookup_tpu.core import pad_points
from pointcloudhookup_tpu.ops.cluster import dbscan
from pointcloudhookup_tpu.ops.cluster_grid import grid_dbscan


def _partitions_match(a, b):
    ok = (a == -1) == (b == -1)
    if not ok.all():
        return False
    m = a != -1
    pairs = set(zip(a[m].tolist(), b[m].tolist()))
    return len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})


def test_grid_dbscan_matches_exact_on_separated_blobs(rng):
    centers = [[0, 0, 0], [100, 0, 10], [0, 150, 20], [-120, -80, 0]]
    pts = np.vstack(
        [c + rng.normal(0, 2.0, size=(200, 3)) for c in np.asarray(centers)]
        + [rng.uniform(-400, 400, size=(60, 3))]
    ).astype(np.float32)
    xyz, mask = pad_points(pts, 1024)
    exact, _ = dbscan(jnp.asarray(xyz), jnp.asarray(mask), 6.0, 20, tile=256)
    fast, _ = grid_dbscan(
        jnp.asarray(xyz), jnp.asarray(mask), 6.0, 20, max_cells=2048, tile=256
    )
    e = np.asarray(exact)[: len(pts)]
    f = np.asarray(fast)[: len(pts)]
    # cluster memberships agree for all clustered points; the grid
    # approximation may only differ on isolated border/noise points
    core_agree = (e != -1) & (f != -1)
    assert _partitions_match(e[core_agree], f[core_agree])
    # and the disagreement set is tiny
    assert np.mean((e == -1) != (f == -1)) < 0.02


def test_grid_dbscan_on_corridor_towers(corridor):
    pts, centers = corridor
    pts = pts[pts[:, 2] > 8.0]  # crude ground cut to isolate towers
    xyz, mask = pad_points(pts.astype(np.float32), 2048)
    labels, core = grid_dbscan(
        jnp.asarray(xyz), jnp.asarray(mask), 5.0, 20, max_cells=2048, tile=256
    )
    lab = np.asarray(labels)[: len(pts)]
    n_clusters = len(set(lab.tolist()) - {-1})
    assert n_clusters == len(centers)
    # every tower column maps to exactly one cluster
    for cx, cy, _ in centers:
        sel = (np.abs(pts[:, 0] - cx) < 8) & (np.abs(pts[:, 1] - cy) < 8)
        ids = set(lab[sel].tolist()) - {-1}
        assert len(ids) == 1
