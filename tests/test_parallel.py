import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudhookup_tpu.config import (
    ClusterParams,
    ExtractParams,
    GroundParams,
)
from pointcloudhookup_tpu.parallel.sharded import make_sharded_extract, tile_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (virtual) devices"
)


def _params():
    return ExtractParams(
        ground=GroundParams(min_points_after=64),
        cluster=ClusterParams(eps=5.0, min_points=16),
        max_clusters=16,
        obb_angles=32,
    )


def _make_inputs(rng, n_dev, per_shard=1024):
    """Corridor where each shard holds one spatial tile with one tower."""
    from pointcloudhookup_tpu.io.synthetic import synthetic_corridor

    total = per_shard * n_dev
    shard_pts = []
    centers = []
    for d in range(n_dev):
        pts, c = synthetic_corridor(
            rng,
            n_ground=per_shard - 300,
            n_veg=0,
            towers=((0.0, 0.0),),
            pts_per_tower=280,
            extent=120.0,
            origin=(d * 300.0, 0.0, 0.0),
        )
        # clamp to shard capacity
        pts = pts[:per_shard]
        shard_pts.append(pts)
        centers.append(c[0])
    xyz = np.zeros((total, 3), np.float32)
    mask = np.zeros(total, bool)
    for d, pts in enumerate(shard_pts):
        xyz[d * per_shard : d * per_shard + len(pts)] = pts
        mask[d * per_shard : d * per_shard + len(pts)] = True
    return xyz, mask, np.array(centers)


def test_sharded_extract_runs_and_finds_towers(rng):
    n_dev = 4
    mesh = tile_mesh(n_dev)
    step, in_sharding = make_sharded_extract(mesh, _params())
    xyz, mask, centers = _make_inputs(rng, n_dev)
    xa = jax.device_put(jnp.asarray(xyz), in_sharding)
    ma = jax.device_put(jnp.asarray(mask), in_sharding)
    labels, merged = step(xa, ma)
    accepted = np.asarray(merged["accepted"])
    got_centers = np.asarray(merged["center"])[accepted]
    assert accepted.sum() == len(centers)
    got = np.array(sorted(got_centers[:, 0].tolist()))
    want = np.array(sorted(centers[:, 0].tolist()))
    np.testing.assert_allclose(got, want, atol=2.5)


@pytest.mark.heavy
def test_sharded_extract_fast_path(rng):
    """fast=True (fused front-end + accum OBB per shard, global psum'd
    ground base) finds the same towers as the modular sharded step."""
    n_dev = 4
    mesh = tile_mesh(n_dev)
    step, in_sharding = make_sharded_extract(mesh, _params(), fast=True)
    xyz, mask, centers = _make_inputs(rng, n_dev)
    xa = jax.device_put(jnp.asarray(xyz), in_sharding)
    ma = jax.device_put(jnp.asarray(mask), in_sharding)
    labels, merged = step(xa, ma)
    accepted = np.asarray(merged["accepted"])
    got_centers = np.asarray(merged["center"])[accepted]
    assert accepted.sum() == len(centers)
    got = np.array(sorted(got_centers[:, 0].tolist()))
    want = np.array(sorted(centers[:, 0].tolist()))
    np.testing.assert_allclose(got, want, atol=2.5)


def test_sharded_merge_unifies_boundary_tower(rng):
    """A tower duplicated on two neighboring shards (as if split by a
    tile boundary) must be merged into ONE accepted tower."""
    n_dev = 4
    per_shard = 1024
    mesh = tile_mesh(n_dev)
    step, in_sharding = make_sharded_extract(mesh, _params(), merge_radius=6.0)
    xyz, mask, centers = _make_inputs(rng, n_dev, per_shard)
    # copy shard 0's tower points (rows 724:1004 of shard 0 = after its
    # 724 ground points) over 280 of shard 1's GROUND rows, keeping the
    # same world position -> two fragments of the same tower exist on
    # two shards; shard 1's own tower at x=300 is untouched
    src = slice(724, 1004)
    dst = slice(per_shard, per_shard + 280)
    xyz[dst] = xyz[src]
    mask[dst] = mask[src]
    xa = jax.device_put(jnp.asarray(xyz), in_sharding)
    ma = jax.device_put(jnp.asarray(mask), in_sharding)
    _, merged = step(xa, ma)
    assert int(np.asarray(merged["accepted"]).sum()) == len(centers)


@pytest.mark.heavy
def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert "accepted" in out


@pytest.mark.heavy
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_merge_fragments_equal_count_tiebreak():
    """Two equal-count fragments in one merge group must yield exactly
    ONE representative (f32-epsilon tie-breaks fail above ~a few hundred
    counts); the survivor carries the accumulated count."""
    from pointcloudhookup_tpu.parallel.sharded import _merge_fragments

    k = 8
    lo = np.full((k, 3), 1e9, np.float32)
    hi = np.full((k, 3), 1e9, np.float32)
    # fragments 2 and 5: same AABB, equal large counts
    lo[2] = lo[5] = [0.0, 0.0, 0.0]
    hi[2] = hi[5] = [10.0, 10.0, 40.0]
    counts = np.zeros(k, np.float32)
    counts[2] = counts[5] = 4097.0
    alive = np.zeros(k, bool)
    alive[2] = alive[5] = True
    stats = {
        "count": jnp.asarray(counts),
        "alive": jnp.asarray(alive),
        "aabb_min": jnp.asarray(lo),
        "aabb_max": jnp.asarray(hi),
    }
    merged = jax.jit(lambda s: _merge_fragments(s, 6.0))(stats)
    alive_out = np.asarray(merged["alive"])
    assert alive_out.sum() == 1
    assert alive_out[2]  # lowest index wins the tie
    assert float(np.asarray(merged["count"])[2]) == 8194.0


@pytest.mark.heavy
@pytest.mark.slow
def test_sharded_fast_precut_engages(rng):
    """Shards >= 131072 rows engage the ground pre-cut against the
    GLOBAL psum'd base (frontend precut_div): towers must still match
    the small-shard (pre-cut disabled) semantics."""
    n_dev = 2
    mesh = tile_mesh(n_dev)
    step, in_sharding = make_sharded_extract(mesh, _params(), fast=True)
    xyz, mask, centers = _make_inputs(rng, n_dev, per_shard=131072)
    xa = jax.device_put(jnp.asarray(xyz), in_sharding)
    ma = jax.device_put(jnp.asarray(mask), in_sharding)
    labels, merged = step(xa, ma)
    accepted = np.asarray(merged["accepted"])
    got_centers = np.asarray(merged["center"])[accepted]
    assert accepted.sum() == len(centers)
    got = np.array(sorted(got_centers[:, 0].tolist()))
    want = np.array(sorted(centers[:, 0].tolist()))
    np.testing.assert_allclose(got, want, atol=2.5)
    assert float(merged["cells_overflow"]) == 0.0
