"""Sort-free OBB accumulation kernel vs oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from pointcloudhookup_tpu.core import pad_points
from pointcloudhookup_tpu.ops.morton import morton_encode
from pointcloudhookup_tpu.ops.pallas.obb_accum import (
    obb_accumulate,
    obb_accumulate_reference,
)


def _fixture(rng, n=4096, k=8):
    """Morton codes + spatially-coherent labels (run-structured like the
    frontend's output) with interleaved unlabeled rows."""
    pts = np.vstack(
        [
            [40 * c, 15 * c, 3 * c] + rng.normal(0, 4.0, size=(n // (k + 1), 3))
            for c in range(k)
        ]
        + [rng.uniform(0, 400, size=(n - (n // (k + 1)) * k, 3))]
    ).astype(np.float32)
    mn = pts.min(axis=0)
    v = np.floor((pts - mn) / 0.1).astype(np.int32)
    hi, lo = morton_encode(jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]), jnp.asarray(v[:, 2]))
    labels = np.full(n, -1, np.int32)
    per = n // (k + 1)
    for c in range(k):
        labels[c * per : (c + 1) * per] = c
    # drop some rows to noise so blocks mix labeled/unlabeled
    labels[rng.random(n) < 0.2] = -1
    # morton-sort rows like the frontend does
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    return (
        jnp.asarray(np.asarray(hi)[order]),
        jnp.asarray(np.asarray(lo)[order]),
        jnp.asarray(labels[order]),
        jnp.asarray(mn),
    )


def test_kernel_matches_reference_interpret(rng):
    hi, lo, labels, mn = _fixture(rng)
    ref = obb_accumulate_reference(
        hi, lo, labels, mn, max_clusters=8, num_angles=32
    )
    ker = obb_accumulate(
        hi, lo, labels, mn, max_clusters=8, num_angles=32, block=512,
        interpret=True,
    )
    for key in ref:
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(ker[key]), rtol=1e-5, atol=1e-4,
            err_msg=key,
        )


@pytest.mark.heavy
def test_accum_stats_match_sort_path(corridor):
    """cluster_obb_stats_accum must agree with the sort-based codes OBB
    at tower level on the corridor (flat-A vs coarse+refine angle search
    land within one angle step)."""
    import dataclasses

    from pointcloudhookup_tpu.config import ExtractParams
    from pointcloudhookup_tpu.ops.frontend_fused import fused_downsample_ground_cluster
    from pointcloudhookup_tpu.ops.obb import (
        cluster_obb_stats_accum,
        cluster_obb_stats_codes,
    )

    pts, centers = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    p = ExtractParams()
    p = dataclasses.replace(
        p, cluster=dataclasses.replace(p.cluster, eps=5.0, min_points=20)
    )
    hi, lo, keep, labels, base, mn = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), p,
        max_cells=2048, min_cell_points=1, geometric_voxels=True, emit="codes",
    )
    s_sort = cluster_obb_stats_codes(
        hi, lo, labels, keep, mn, max_clusters=p.max_clusters,
        num_angles=p.obb_angles,
    )
    s_acc = cluster_obb_stats_accum(
        hi, lo, labels, keep, mn, max_clusters=p.max_clusters,
        num_angles=p.obb_angles, block=512, use_pallas=False,
    )
    np.testing.assert_array_equal(
        np.asarray(s_sort["alive"]), np.asarray(s_acc["alive"])
    )
    np.testing.assert_allclose(
        np.asarray(s_sort["count"]), np.asarray(s_acc["count"])
    )
    alive = np.asarray(s_sort["alive"])
    for key, tol in [("centroid", 1e-3), ("center", 0.2), ("extent", 0.2)]:
        np.testing.assert_allclose(
            np.asarray(s_sort[key])[alive], np.asarray(s_acc[key])[alive],
            atol=tol, err_msg=key,
        )
    # aabb bounds are exact in both paths
    for key in ("aabb_min", "aabb_max"):
        np.testing.assert_allclose(
            np.asarray(s_sort[key])[alive], np.asarray(s_acc[key])[alive],
            atol=1e-4, err_msg=key,
        )
    assert float(s_acc["overflow"]) == 0.0


def test_accum_kernel_stats_interpret(corridor):
    """The PALLAS kernel (interpret) behind cluster_obb_stats_accum
    agrees with its XLA reference on real frontend output."""
    import dataclasses

    from pointcloudhookup_tpu.config import ExtractParams
    from pointcloudhookup_tpu.ops.frontend_fused import fused_downsample_ground_cluster
    from pointcloudhookup_tpu.ops.pallas.obb_accum import (
        obb_accumulate,
        obb_accumulate_reference,
    )

    pts, centers = corridor
    origin = pts.mean(axis=0)
    xyz, mask = pad_points((pts - origin).astype(np.float32), 8192)
    p = ExtractParams()
    p = dataclasses.replace(
        p, cluster=dataclasses.replace(p.cluster, eps=5.0, min_points=20)
    )
    hi, lo, keep, labels, base, mn = fused_downsample_ground_cluster(
        jnp.asarray(xyz), jnp.asarray(mask), p,
        max_cells=2048, min_cell_points=1, geometric_voxels=True, emit="codes",
    )
    lab = jnp.where(keep, labels, -1)
    ref = obb_accumulate_reference(hi, lo, lab, mn, max_clusters=32, num_angles=32)
    ker = obb_accumulate(
        hi, lo, lab, mn, max_clusters=32, num_angles=32, block=1024,
        interpret=True,
    )
    for key in ref:
        np.testing.assert_allclose(
            np.asarray(ref[key]), np.asarray(ker[key]), rtol=1e-5, atol=1e-4,
            err_msg=key,
        )


def test_obb_accumulate_xyz_matches_reference(rng):
    from pointcloudhookup_tpu.ops.pallas.obb_accum import (
        obb_accumulate_xyz,
        obb_accumulate_xyz_reference,
    )

    n, k, a = 8192, 32, 32
    x = (rng.normal(size=n) * 50).astype(np.float32)
    y = (rng.normal(size=n) * 50).astype(np.float32)
    z = rng.uniform(0, 60, n).astype(np.float32)
    lab = rng.integers(-1, k, n).astype(np.int32)
    ker = obb_accumulate_xyz(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), jnp.asarray(lab),
        max_clusters=k, num_angles=a, interpret=True,
    )
    ref = obb_accumulate_xyz_reference(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), jnp.asarray(lab),
        max_clusters=k, num_angles=a,
    )
    for key in ref:
        np.testing.assert_allclose(
            np.asarray(ker[key]), np.asarray(ref[key]), rtol=1e-5,
            atol=1e-3, err_msg=key,
        )
