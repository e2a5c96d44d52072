"""Ground pre-cut + compaction (precut_div) vs the plain fast path.

The pre-cut must be invisible to results: same base (both sides sample
the same statistic source here — see the bound on the raw-vs-voxel
delta below), identical accepted towers, identical cluster count.
Runs on the CPU backend via compact_rows_reference.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pointcloudhookup_tpu.config import ClusterParams, ExtractParams  # noqa: E402
from pointcloudhookup_tpu.io.synthetic import synthetic_corridor  # noqa: E402
from pointcloudhookup_tpu.ops.frontend_fused import fused_extract_step  # noqa: E402


def _workload(n):
    rng = np.random.default_rng(5)
    xs = np.linspace(-400, 400, 6)
    ys = 30.0 * np.sin(xs / 200.0)
    pts, centers = synthetic_corridor(
        rng,
        n_ground=int(n * 0.8),
        n_veg=int(n * 0.12),
        towers=tuple(zip(xs, ys)),
        pts_per_tower=max((n - int(n * 0.92)) // 6, 1),
        extent=450.0,
        n_line=0,
    )
    pts = pts[:n]
    xyz = np.zeros((n, 3), np.float32)
    xyz[: len(pts)] = (pts - pts.mean(axis=0)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[len(pts):] = False
    return jnp.asarray(xyz), jnp.asarray(mask), centers


@pytest.mark.heavy
@pytest.mark.parametrize("div", [2, 4])
def test_precut_matches_plain_fast(div):
    n = 131072  # smallest size where cap = n//div stays >= 32768
    xyz, mask, centers = _workload(n)
    params = ExtractParams(max_clusters=64)

    kw = dict(
        params=params, max_cells=2048, min_cell_points=3,
        geometric_voxels=True, obb="sort",
    )
    plain = fused_extract_step(xyz, mask, **kw)
    pre = fused_extract_step(xyz, mask, precut_div=div, **kw)

    acc_a = np.asarray(plain["accepted"])
    acc_b = np.asarray(pre["accepted"])
    assert acc_a.sum() == len(centers), "plain fast path must find all towers"
    # the pre-cut changes the base's sample source (raw strided z vs
    # voxel-row strided z) — identical acceptance is still required on
    # this tile, and centers must agree to float tolerance
    assert acc_b.sum() == acc_a.sum()
    ca = np.asarray(plain["center"])[acc_a.astype(bool)]
    cb = np.asarray(pre["center"])[acc_b.astype(bool)]
    ca = ca[np.lexsort(ca.T)]
    cb = cb[np.lexsort(cb.T)]
    np.testing.assert_allclose(ca, cb, atol=0.35)
    assert float(pre["cells_overflow"]) == 0.0


def test_precut_overflow_flagged():
    # a tile that is ~all structure overflows cap = n/8 and must flag it
    n = 131072 * 2
    rng = np.random.default_rng(7)
    xyz = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(0, 80, n).astype(np.float32)  # tall block
    mask = np.ones(n, bool)
    params = ExtractParams(max_clusters=64)
    out = fused_extract_step(
        jnp.asarray(xyz), jnp.asarray(mask), params=params, max_cells=2048,
        min_cell_points=3, geometric_voxels=True, obb="sort", precut_div=8,
    )
    assert float(out["cells_overflow"]) > 0.0


def test_precut_disabled_below_capacity_floor():
    # n too small for a 32768-row capacity: precut must silently disable
    n = 65536
    xyz, mask, centers = _workload(n)
    params = ExtractParams(max_clusters=64)
    out = fused_extract_step(
        xyz, mask, params=params, max_cells=2048, min_cell_points=3,
        geometric_voxels=True, obb="sort", precut_div=4,
    )
    # shapes stay at n (no compaction happened)
    assert out["labels"].shape[0] == n
