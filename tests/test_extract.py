import numpy as np
import pytest
import jax.numpy as jnp

from pointcloudhookup_tpu.config import (
    ClusterParams,
    ExtractParams,
    GroundParams,
    TowerFilterParams,
)
from pointcloudhookup_tpu.core import PointBatch
from pointcloudhookup_tpu.models.towers import extract_step, towers_from_stats


def _small_params(**over):
    base = dict(
        ground=GroundParams(min_points_after=100),
        cluster=ClusterParams(eps=5.0, min_points=30),
        filters=TowerFilterParams(),
        max_clusters=32,
        obb_angles=64,
    )
    base.update(over)
    return ExtractParams(**base)


def test_extract_step_finds_towers(corridor):
    pts, centers = corridor
    batch = PointBatch.from_numpy(pts, capacity=8192)
    stats = extract_step(batch.xyz, batch.mask, _small_params())
    towers = towers_from_stats(
        {k: np.asarray(v) for k, v in stats.items()}, batch.origin
    )
    assert len(towers) == len(centers)
    got = np.array(sorted(t.center[:2].tolist() for t in towers))
    want = np.array(sorted(centers[:, :2].tolist()))
    np.testing.assert_allclose(got, want, atol=2.0)
    for t in towers:
        assert t.height > 15.0
        assert 8.0 < t.width < 50.0


def test_extract_dedup_suppresses_close_towers(rng, corridor):
    # Add a second tower 20 m from an existing one: a separate cluster
    # (surface gap 8 m > eps 5 m) but within duplicate_threshold 30 m,
    # so dedup must drop one of the pair.
    pts, centers = corridor
    twin = pts[-400:].copy()  # the last tower's points
    twin[:, 0] += 20.0
    pts2 = np.vstack([pts, twin])
    batch = PointBatch.from_numpy(pts2, capacity=8192)
    stats = extract_step(batch.xyz, batch.mask, _small_params())
    accepted = int(np.asarray(stats["accepted"]).sum())
    assert accepted == len(centers)


def test_extract_ground_points_not_clustered(corridor):
    pts, _ = corridor
    batch = PointBatch.from_numpy(pts, capacity=8192)
    stats = extract_step(batch.xyz, batch.mask, _small_params())
    keep = np.asarray(stats["ground_keep"])
    mask = np.asarray(batch.mask)
    # ground plane (z around 0) must be filtered out
    z = np.asarray(batch.xyz)[:, 2]
    assert not keep[mask & (z < np.percentile(z[mask], 25) + 1.0)].any()


def test_random_downsample(rng):
    import jax
    import jax.numpy as jnp

    from pointcloudhookup_tpu.ops.sample import (
        random_downsample,
        recommend_chunk_size,
    )

    pts = rng.uniform(0, 100, size=(1000, 3)).astype(np.float32)
    xyz = np.zeros((1024, 3), np.float32)
    xyz[:1000] = pts
    mask = np.zeros(1024, bool)
    mask[:1000] = True
    out, keep = random_downsample(
        jnp.asarray(xyz), jnp.asarray(mask), jax.random.key(0), 256
    )
    assert int(np.asarray(keep).sum()) == 256
    kept = np.asarray(out)[np.asarray(keep)]
    # every kept point is one of the inputs
    assert {tuple(np.round(p, 3)) for p in kept} <= {
        tuple(np.round(p, 3)) for p in pts
    }
    # fewer valid than cap -> all survive
    _, keep2 = random_downsample(
        jnp.asarray(xyz), jnp.asarray(mask), jax.random.key(0), 2000
    )
    assert int(np.asarray(keep2).sum()) == 1000
    assert recommend_chunk_size(4) == 500_000
    assert recommend_chunk_size(16) == 2_000_000


@pytest.mark.heavy
def test_grid_overflow_retries_density_floor():
    """A cell table too small for the sparse-vegetation cell count must
    not silently lose towers: extract_from_points retries with a higher
    min_cell_points floor until the dense cells fit (the 4M corridor
    failure mode: 65536 cells, 6/24 towers before the retry)."""
    import dataclasses

    from pointcloudhookup_tpu.config import ClusterParams, ExtractParams
    from pointcloudhookup_tpu.io.synthetic import synthetic_corridor
    from pointcloudhookup_tpu.models.pipeline import extract_from_points

    rng = np.random.default_rng(3)
    pts, centers = synthetic_corridor(
        rng,
        n_ground=40000,
        n_veg=60000,  # dense scattered vegetation: many 1-2 point cells
        towers=((-120.0, 0.0), (0.0, 0.0), (120.0, 0.0)),
        pts_per_tower=2500,
        extent=160.0,
        n_line=0,
    )
    params = ExtractParams(
        cluster=ClusterParams(
            method="grid", max_cells=1024, min_cell_points=1,
            eps=6.0, min_points=60,
        ),
        max_clusters=64,
    )
    towers, stats, origin = extract_from_points(np.asarray(pts, np.float64), params)
    assert float(stats["cells_overflow"]) == 0.0
    assert len(towers) == len(centers)
