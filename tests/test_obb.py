import numpy as np
import jax.numpy as jnp

from pointcloudhookup_tpu.ops.obb import cluster_obb_stats, min_area_rect_numpy


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def test_obb_recovers_rotated_box(rng):
    # A dense box of extent 20 x 6 x 35 rotated by 30 deg.
    n = 3000
    local = rng.uniform(-0.5, 0.5, size=(n, 3)) * np.array([20.0, 6.0, 35.0])
    xy = local[:, :2] @ _rot(np.radians(30.0)).T
    pts = np.column_stack([xy + np.array([100.0, -50.0]), local[:, 2] + 40.0]).astype(
        np.float32
    )
    xyz = np.zeros((4096, 3), np.float32)
    xyz[:n] = pts
    labels = np.full(4096, -1, np.int32)
    labels[:n] = 0
    mask = np.zeros(4096, bool)
    mask[:n] = True
    stats = cluster_obb_stats(
        jnp.asarray(xyz), jnp.asarray(labels), jnp.asarray(mask), max_clusters=8
    )
    ext = np.asarray(stats["extent"])[0]
    assert abs(ext[0] - 20.0) < 0.3
    assert abs(ext[1] - 6.0) < 0.3
    assert abs(ext[2] - 35.0) < 0.1
    center = np.asarray(stats["center"])[0]
    np.testing.assert_allclose(center, [100.0, -50.0, 40.0], atol=0.3)
    # long-axis angle = 30 deg (mod 180)
    ang = np.degrees(float(stats["angle"][0])) % 180.0
    assert min(abs(ang - 30.0), abs(ang - 210.0 % 180)) < 1.0
    # north angle convention: (90 - atan2deg) % 360, mod 180 ambiguity
    north = float(stats["north_angle"][0]) % 180.0
    assert abs(north - 60.0) < 1.0


def test_obb_matches_rotating_calipers_area(rng):
    pts = rng.normal(0, 1, size=(500, 2)) @ np.diag([8.0, 2.0]) @ _rot(0.7).T
    xyz = np.zeros((512, 3), np.float32)
    xyz[:500, :2] = pts
    labels = np.full(512, -1, np.int32)
    labels[:500] = 0
    mask = np.zeros(512, bool)
    mask[:500] = True
    stats = cluster_obb_stats(
        jnp.asarray(xyz), jnp.asarray(labels), jnp.asarray(mask), max_clusters=4
    )
    ext = np.asarray(stats["extent"])[0]
    _, (eu, ev) = min_area_rect_numpy(pts)
    want = sorted([eu, ev], reverse=True)
    np.testing.assert_allclose(ext[:2], want, rtol=0.02)


def test_obb_multiple_clusters_and_counts(rng):
    a = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    b = rng.uniform(0, 1, size=(300, 3)).astype(np.float32) + 50.0
    xyz = np.zeros((1024, 3), np.float32)
    xyz[:200] = a
    xyz[200:500] = b
    labels = np.full(1024, -1, np.int32)
    labels[:200] = 0
    labels[200:500] = 1
    mask = np.zeros(1024, bool)
    mask[:500] = True
    stats = cluster_obb_stats(
        jnp.asarray(xyz), jnp.asarray(labels), jnp.asarray(mask), max_clusters=8
    )
    counts = np.asarray(stats["count"])
    assert counts[0] == 200 and counts[1] == 300 and counts[2] == 0
    np.testing.assert_allclose(
        np.asarray(stats["centroid"])[1], b.mean(axis=0), atol=1e-3
    )
    assert not np.asarray(stats["alive"])[2:].any()
