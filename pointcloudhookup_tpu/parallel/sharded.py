"""Multi-device (mesh/ICI) extraction.

The reference is single-process; its "parallelism" is chunked loops on
one CPU pool (SURVEY.md section 2.3).  The TPU-native scale-out design
(BASELINE config 5: 50M+ point corridors on a v5e slice) shards corridor
points over a 1-D device mesh ("tiles" axis = spatial/data parallelism)
and keeps every collective on ICI:

  * global ground percentile: per-shard histograms + `psum` (one
    all-reduce of a 4096-bin vector), identical result on every shard —
    the distributed equivalent of np.percentile over the whole corridor;
  * clustering + OBB statistics run shard-locally (zero communication);
  * per-shard cluster summaries are `all_gather`ed (K x stats, tiny) and
    every shard deterministically merges fragments / filters / dedups the
    global tower list (replicated compute instead of a gather-to-host).

Fragment merging joins clusters whose axis-aligned bounding boxes come
within `merge_radius` on every axis (the distributed generalization of
the cross-chunk union-find fix from /root/reference/test/tttt.py:104-174);
the surviving fragment is the largest, with counts accumulated.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointcloudhookup_tpu.config import ExtractParams
from pointcloudhookup_tpu.models.towers import filter_and_dedup
from pointcloudhookup_tpu.ops.cluster import dbscan
from pointcloudhookup_tpu.ops.obb import cluster_obb_stats
from pointcloudhookup_tpu.ops.percentile import (
    histogram_counts,
    percentile_from_histogram,
)

AXIS = "tiles"


def tile_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _global_ground_base(xyz, mask, params, num_bins=4096):
    """GLOBAL height percentile + retry decision (psum'd): the single
    source of the ground-cut parameters for both sharded step variants."""
    gp = params.ground
    z = xyz[:, 2]
    big = jnp.float32(3.0e38)
    lo = lax.pmin(jnp.min(jnp.where(mask, z, big)), AXIS)
    hi = lax.pmax(jnp.max(jnp.where(mask, z, -big)), AXIS)
    counts = lax.psum(histogram_counts(z, mask, lo, hi, num_bins), AXIS)
    base = percentile_from_histogram(counts, lo, hi, gp.percentile)
    n_keep = lax.psum(
        jnp.sum((mask & (z > base + gp.offset)).astype(jnp.int32)), AXIS
    )
    return base, n_keep < gp.min_points_after


def _global_ground_keep(xyz, mask, params, num_bins=4096):
    """Shard-local ground filter against the GLOBAL height percentile."""
    gp = params.ground
    base, use_retry = _global_ground_base(xyz, mask, params, num_bins)
    off = jnp.where(use_retry, gp.retry_offset, gp.offset)
    keep = mask & (xyz[:, 2] > base + off)
    return keep, base


def _merge_fragments(stats, merge_radius):
    """Deterministic fragment merge over the gathered [D*K] summaries.

    Two fragments are joined when their axis-aligned bounding boxes come
    within `merge_radius` on EVERY axis (a cluster split by a tile
    boundary always has eps-adjacent boxes) — much tighter than centroid
    distance, which misses large split clusters and over-merges small
    nearby ones.  Representative = largest-count fragment, counts are
    accumulated."""
    counts = stats["count"]
    alive = stats["alive"]
    k = counts.shape[0]
    lo = stats["aabb_min"]
    hi = stats["aabb_max"]
    gap_ok = jnp.all(
        (lo[:, None, :] - hi[None, :, :] <= merge_radius)
        & (lo[None, :, :] - hi[:, None, :] <= merge_radius),
        axis=-1,
    )
    adj = gap_ok & alive[:, None] & alive[None, :]
    rep = jnp.where(alive, jnp.arange(k, dtype=jnp.int32), jnp.int32(k))

    def step(state):
        r, _, it = state
        nm = jnp.min(jnp.where(adj, r[None, :], k), axis=1)
        new = jnp.where(alive, jnp.minimum(r, nm), r)
        new = jnp.where(alive, jnp.minimum(new, new[jnp.clip(new, 0, k - 1)]), new)
        return new, jnp.any(new != r), it + 1

    rep, _, _ = lax.while_loop(
        lambda s: s[1] & (s[2] < 16), step, (rep, jnp.bool_(True), jnp.int32(0))
    )
    # group count sums; representative = fragment with max count in group
    grp = jnp.where(alive, rep, k)
    total = jax.ops.segment_sum(counts, grp, num_segments=k + 1)[:k]
    # "is this fragment the argmax-count member of its group?"  Integer
    # tie-break (equal counts -> lowest fragment index): a float epsilon
    # (counts - i*1e-7) is below f32 resolution once counts exceed a few
    # hundred and would keep BOTH tied members alive.
    ci = counts.astype(jnp.int32)
    idx = jnp.arange(k, dtype=jnp.int32)
    grp_maxc = jax.ops.segment_max(
        jnp.where(alive, ci, -1), grp, num_segments=k + 1
    )[:k]
    is_max = alive & (ci == grp_maxc[jnp.clip(rep, 0, k - 1)])
    grp_min_idx = jax.ops.segment_min(
        jnp.where(is_max, idx, k), grp, num_segments=k + 1
    )[:k]
    is_rep = is_max & (idx == grp_min_idx[jnp.clip(rep, 0, k - 1)])
    merged = dict(stats)
    merged["count"] = jnp.where(is_rep, total[jnp.clip(rep, 0, k - 1)], 0.0)
    merged["alive"] = is_rep
    return merged


def make_sharded_extract(
    mesh: Mesh,
    params: ExtractParams = ExtractParams(),
    merge_radius: float = 6.0,
    fast: bool = False,
    fast_max_cells: int | None = None,
):
    """Build the jitted multi-chip extraction step.

    Input xyz f32[D*N, 3] / mask bool[D*N] sharded over AXIS; returns
    (per-shard labels i32[D*N] sharded, replicated global tower stats
    dict [D*K] + accepted mask).

    fast=True runs the single-chip fast path per shard — fused Morton
    front-end (one keys-only sort) + the sort-free Pallas OBB
    accumulation — against the GLOBAL psum'd ground percentile (the
    per-shard base/retry decision is replicated, so every shard applies
    the identical cut).  The collective structure is unchanged:
    all_gather of [K] summaries + deterministic replicated merge.

    The fused fast path keeps its dense 3.2 m-cell table (NOT the
    modular grid path's 0.1 m-cell table, so ClusterParams.max_cells —
    default 65536, sized for the latter — does not transfer 1:1) at its
    own default of 8192 entries.  Pass `fast_max_cells` (a multiple of
    1024) to size it explicitly for dense corridors; when
    ClusterParams.max_cells was set BELOW the fused default it is
    honored, and any clamp of a larger request is warned about at build
    time rather than applied silently."""
    n_dev = mesh.devices.size

    _FUSED_DEFAULT_CELLS = 8192
    if fast:
        cp0 = params.cluster
        if fast_max_cells is not None:
            if fast_max_cells % 1024:
                raise ValueError("fast_max_cells must be a multiple of 1024")
            fused_cells = fast_max_cells
        elif cp0.max_cells <= _FUSED_DEFAULT_CELLS:
            fused_cells = cp0.max_cells
        else:
            fused_cells = _FUSED_DEFAULT_CELLS
            if cp0.max_cells != 65536:  # non-default: the caller meant it
                import warnings

                warnings.warn(
                    f"sharded fast path: ClusterParams.max_cells={cp0.max_cells} "
                    f"exceeds the fused cell-table default {_FUSED_DEFAULT_CELLS}; "
                    "clamping. Pass fast_max_cells to size the fused table "
                    "explicitly.",
                    stacklevel=2,
                )

    def fast_step(xyz, mask):
        from pointcloudhookup_tpu.ops.frontend_fused import (
            fused_downsample_ground_cluster,
        )
        from pointcloudhookup_tpu.ops.obb import cluster_obb_stats_accum

        base, use_retry = _global_ground_base(xyz, mask, params)
        cp = params.cluster
        # precut_div: each shard pre-cuts against the GLOBAL base (and
        # the globally-decided retry offset, so the threshold is exact)
        # and compacts survivors, running its sort and every [N] stage
        # at N/4; auto-disabled on small/unaligned shards.  Capacity
        # overflow rides the psum'd cells_overflow flag.
        hi, lo, keep, labels, _, mn, cells_over, _hier = fused_downsample_ground_cluster(
            xyz, mask, params, max_cells=fused_cells,
            min_cell_points=cp.min_cell_points, geometric_voxels=True,
            emit="codes", ground_override=(base, use_retry),
            return_cells_overflow=True, precut_div=4,
        )
        stats = cluster_obb_stats_accum(
            hi, lo, labels, keep, mn, max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
            use_pallas=jax.default_backend() == "tpu",
        )
        gathered = {
            key: lax.all_gather(val, AXIS).reshape((-1,) + val.shape[1:])
            for key, val in stats.items()
        }
        merged = _merge_fragments(gathered, merge_radius)
        accepted = filter_and_dedup(merged, params.filters)
        merged["accepted"] = accepted
        merged["base_height"] = base
        # dense cells beyond the per-shard kernel capacity never pack —
        # surface the total dropped-cell count instead of losing towers
        # silently (same quality flag as the single-chip fast path)
        merged["cells_overflow"] = lax.psum(cells_over, AXIS)
        return labels, merged

    def step(xyz, mask):
        keep, base = _global_ground_keep(xyz, mask, params)
        cp = params.cluster
        n_local = xyz.shape[0]
        if cp.method == "grid" or (cp.method == "auto" and n_local > cp.auto_grid_threshold):
            from pointcloudhookup_tpu.ops.cluster_grid import grid_dbscan

            labels, _core, cells_over = grid_dbscan(
                xyz, keep, cp.eps, cp.min_points,
                max_cells=cp.max_cells, min_cell_points=cp.min_cell_points,
                return_overflow=True,
            )
        else:
            labels, _core = dbscan(xyz, keep, cp.eps, cp.min_points)
            cells_over = jnp.float32(0.0)
        stats = cluster_obb_stats(
            xyz,
            labels,
            keep,
            max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
        )
        # gather per-shard summaries -> [D*K] replicated on every shard
        gathered = {
            key: lax.all_gather(val, AXIS).reshape((-1,) + val.shape[1:])
            for key, val in stats.items()
        }
        merged = _merge_fragments(gathered, merge_radius)
        accepted = filter_and_dedup(merged, params.filters)
        merged["accepted"] = accepted
        merged["base_height"] = base
        # same quality flag as the fast path: dense cells beyond the
        # per-shard table never pack, so losing them must be visible
        merged["cells_overflow"] = lax.psum(cells_over, AXIS)
        return labels, merged

    stats_specs = dict(
        count=P(),
        alive=P(),
        centroid=P(),
        center=P(),
        extent=P(),
        angle=P(),
        north_angle=P(),
        aabb_min=P(),
        aabb_max=P(),
        overflow=P(),
        accepted=P(),
        base_height=P(),
        cells_overflow=P(),
    )
    shardmapped = jax.shard_map(
        fast_step if fast else step,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), stats_specs),
        check_vma=False,
    )
    return jax.jit(shardmapped), NamedSharding(mesh, P(AXIS))
