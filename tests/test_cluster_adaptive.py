"""Adaptive (knob-free) clustering — the HDBSCAN-path analogue.

The reference switches to HDBSCAN(min_cluster_size) when available
(/root/reference/test/008.py:245-268) so the operator never tunes eps.
Our analogue derives eps from the data's core-distance quantile and
applies min-cluster-SIZE filtering on top of grid_dbscan.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pointcloudhookup_tpu.core import pad_points
from pointcloudhookup_tpu.ops.cluster_adaptive import (
    adaptive_cluster,
    estimate_eps,
)


def test_estimate_eps_tracks_point_spacing(rng):
    # two regular-ish blobs with ~1 m spacing: the core-distance
    # quantile should land near the NN spacing, not the blob span
    pts = np.vstack(
        [
            rng.normal(0, 5.0, size=(2000, 3)),
            [200, 0, 0] + rng.normal(0, 5.0, size=(2000, 3)),
        ]
    ).astype(np.float32)
    xyz, mask = pad_points(pts, 4096)
    eps = float(estimate_eps(jnp.asarray(xyz), jnp.asarray(mask), k=4))
    # mean NN distance for 2000 pts in a sigma=5 gaussian ball is ~0.5 m;
    # the 80th-percentile 4th-NN distance sits within a small multiple
    assert 0.2 < eps < 5.0


def test_adaptive_cluster_separated_blobs_no_eps_knob(rng):
    centers = np.asarray([[0, 0, 0], [120, 0, 10], [0, 160, 20]])
    pts = np.vstack(
        [c + rng.normal(0, 2.0, size=(300, 3)) for c in centers]
        + [rng.uniform(-500, 500, size=(40, 3))]  # sparse noise
    ).astype(np.float32)
    xyz, mask = pad_points(pts, 1024)
    labels, core, eps = adaptive_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), 20, max_cells=2048
    )
    lab = np.asarray(labels)[: len(pts)]
    ids = set(lab.tolist()) - {-1}
    assert len(ids) == 3
    # each blob is one cluster
    for i in range(3):
        blob = lab[i * 300 : (i + 1) * 300]
        blob_ids = set(blob.tolist()) - {-1}
        assert len(blob_ids) == 1
    # the uniform background is overwhelmingly noise
    assert np.mean(lab[900:] == -1) > 0.8


def test_min_cluster_size_demotes_small_clusters(rng):
    # one big blob (400 pts) + one small dense blob (60 pts): with
    # min_cluster_size=100 the small one must come back as noise even
    # though it is dense enough to satisfy min_points
    pts = np.vstack(
        [
            rng.normal(0, 2.0, size=(400, 3)),
            [150, 0, 0] + rng.normal(0, 1.0, size=(60, 3)),
        ]
    ).astype(np.float32)
    xyz, mask = pad_points(pts, 512)
    labels, _, _ = adaptive_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), 10,
        min_cluster_size=100, max_cells=2048,
    )
    lab = np.asarray(labels)[: len(pts)]
    assert len(set(lab[:400].tolist()) - {-1}) == 1
    assert (lab[400:] == -1).all()
    # without the size filter the small blob does cluster
    labels2, _, _ = adaptive_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), 10,
        min_cluster_size=10, max_cells=2048,
    )
    lab2 = np.asarray(labels2)[: len(pts)]
    assert len(set(lab2[400:].tolist()) - {-1}) == 1


@pytest.mark.heavy
def test_adaptive_via_extract_step_finds_towers(corridor):
    """End-to-end: method="adaptive" through the canonical extractor."""
    import dataclasses

    from pointcloudhookup_tpu.config import ExtractParams
    from pointcloudhookup_tpu.models.towers import extract_step

    pts, centers = corridor
    xyz, mask = pad_points(pts.astype(np.float32), 8192)
    p = ExtractParams()
    p = dataclasses.replace(
        p, cluster=dataclasses.replace(p.cluster, method="adaptive")
    )
    out = extract_step(jnp.asarray(xyz), jnp.asarray(mask), p)
    accepted = np.asarray(out["accepted"])
    cx = np.asarray(out["center"])[accepted.astype(bool)]
    assert accepted.sum() == len(centers)
    for c in centers:
        d = np.linalg.norm(cx[:, :2] - np.asarray(c[:2])[None, :], axis=1)
        assert d.min() < 5.0
