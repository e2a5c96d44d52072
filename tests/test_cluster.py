import numpy as np
import jax.numpy as jnp
from sklearn.cluster import DBSCAN

from pointcloudhookup_tpu.core import pad_points
from pointcloudhookup_tpu.ops.cluster import (
    dbscan,
    dbscan_chunked,
    merge_cluster_fragments,
)


def _blobs(rng, centers, n_each=150, spread=1.5):
    pts = [c + rng.normal(0, spread, size=(n_each, 3)) for c in np.asarray(centers)]
    noise = rng.uniform(-100, 100, size=(40, 3))
    return np.vstack(pts + [noise]).astype(np.float32)


def _partition_equal(a, b):
    """Labels equal as partitions (incl. noise -1 treated as its own id
    per point)."""
    assert a.shape == b.shape
    # mapping a->b must be a bijection on cluster ids and -1 must map to -1
    ok = (a == -1) == (b == -1)
    if not ok.all():
        return False
    m = a != -1
    pairs = set(zip(a[m].tolist(), b[m].tolist()))
    return len(pairs) == len(set(p[0] for p in pairs)) == len(
        set(p[1] for p in pairs)
    )


def test_dbscan_matches_sklearn(rng):
    pts = _blobs(rng, [[0, 0, 0], [30, 0, 0], [0, 40, 10]])
    xyz, mask = pad_points(pts, 1024)
    labels, core = dbscan(jnp.asarray(xyz), jnp.asarray(mask), 4.0, 10, tile=256)
    labels = np.asarray(labels)[: len(pts)]
    ref = DBSCAN(eps=4.0, min_samples=10).fit(pts).labels_
    assert _partition_equal(labels, ref)
    # sklearn numbers clusters by first-core-point order; ours should match
    np.testing.assert_array_equal(labels, ref)


def test_dbscan_core_mask_matches_sklearn(rng):
    pts = _blobs(rng, [[0, 0, 0], [25, 25, 0]], n_each=120)
    xyz, mask = pad_points(pts, 512)
    _, core = dbscan(jnp.asarray(xyz), jnp.asarray(mask), 4.0, 15, tile=256)
    fit = DBSCAN(eps=4.0, min_samples=15).fit(pts)
    ref_core = np.zeros(len(pts), bool)
    ref_core[fit.core_sample_indices_] = True
    np.testing.assert_array_equal(np.asarray(core)[: len(pts)], ref_core)


def test_dbscan_all_noise(rng):
    pts = rng.uniform(-500, 500, size=(100, 3)).astype(np.float32)
    xyz, mask = pad_points(pts, 256)
    labels, core = dbscan(jnp.asarray(xyz), jnp.asarray(mask), 1.0, 10, tile=256)
    assert (np.asarray(labels)[: len(pts)] == -1).all()
    assert not np.asarray(core).any()


def test_dbscan_chunked_splits_cluster_and_merge_heals(rng):
    # One spatial cluster whose points are split across two chunks:
    # chunked mode fragments it (reference behavior), merge unifies it.
    cluster = rng.normal(0, 1.0, size=(200, 3)).astype(np.float32)
    xyz = np.zeros((512, 3), np.float32)
    mask = np.zeros(512, bool)
    xyz[:100] = cluster[:100]
    mask[:100] = True
    xyz[256:356] = cluster[100:]
    mask[256:356] = True
    labels, _ = dbscan_chunked(
        jnp.asarray(xyz), jnp.asarray(mask), 4.0, 10, chunk_size=256, tile=256
    )
    lab = np.asarray(labels)
    assert set(lab[:100]) == {0}
    assert set(lab[256:356]) == {256}  # offset by chunk start
    merged = merge_cluster_fragments(
        labels, jnp.asarray(xyz), jnp.asarray(mask), 6.0, max_clusters=512
    )
    m = np.asarray(merged)
    assert set(m[:100]) == set(m[256:356]) == {0}
