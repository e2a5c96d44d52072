"""Exact-semantics extraction front-end at fast-path speed.

`pipeline.extract` is the reference-semantics product surface
(extract_towers, /root/reference/utils/tower_extraction.py:20-240); its
modular device program (ground_filter -> grid_dbscan -> cluster_obb_stats)
pays a 3-key sort, a pack sort, an unsort and a full-N label sort — the
bench fast path is ~20x quicker but buys that with two documented
approximations (strided percentile sample, geometric voxel centers).
This module back-ports the fast path's *semantics-preserving* wins into
an exact program:

  * the global P25 ground base is computed EXACTLY by radix bisection on
    the order-preserving u32 view of z (33 masked [N] count passes,
    bit-identical to masked_percentile) — no [N] sort, and unlike the
    fast path's pre-sort sample there is no sample-vs-final threshold
    discrepancy to provision for: the cut below uses the exact base;
  * above-ground survivors (raw f32 coordinates + original row index)
    are stream-compacted to a fixed N/compact_div capacity with the
    butterfly-concentrator kernel (ops/pallas/compactrows.py), so the
    sort and every downstream pass run at the survivor count (~15-25%
    of a corridor tile);
  * ONE single-u32-key sort (tight-interleaved eps/2 cell key, raw
    coordinates riding as payloads) replaces grid_dbscan's 3-key sort +
    pack sort + unsort;
  * the cell-graph clustering runs in the fused VMEM-resident kernel
    (ops/pallas/cluster_converge.py) — identical partition semantics to
    ops/cluster_grid.py::grid_dbscan: same eps/2 cells anchored at the
    same f32 min corner, same center-distance connectivity, same
    pop >= min_points core rule, same border adoption (the min-label
    fixpoint is seed-order independent);
  * per-cluster OBB statistics accumulate sort-free over the raw
    coordinates (ops/pallas/obb_accum.py::obb_accumulate_xyz) — exact
    member sets, exact centroids/extremes, no per-cluster cap.

Per-point labels come back in cell-sorted order together with each
row's ORIGINAL index; the host scatters them back in numpy (a device
unsort would cost a second full sort).  Semantics match extract_step
with cluster method="grid": same ground keep set, same cluster
partition, same per-cluster point counts; cluster ids and f32 summation
order may differ (centroids to f32 tolerance), and the min-area angle
grid is the accumulation kernel's flat pi/2/A scan instead of the sort
path's coarse+refine search (same resolution).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from pointcloudhookup_tpu.config import ExtractParams
from pointcloudhookup_tpu.ops.cluster import compact_labels
from pointcloudhookup_tpu.ops.morton import interleave_tight
from pointcloudhookup_tpu.ops.percentile import masked_percentile_bisect
from pointcloudhookup_tpu.ops.segments import segmented_scan

_COMPACT_BLOCK = 32768
_KEY_SENTINEL = jnp.uint32(0xFFFFFFFF)


def exact_cell_plan(span_xyz, eps: float):
    """Host-side plan: per-axis cell-key bit widths for a tile.

    span_xyz: per-axis extent in meters (max - min, host floats).
    Returns a static (bx, by, bz) with sum <= 31 (the all-ones key is
    reserved as the invalid-row sentinel), or None when the tile's cell
    grid cannot be packed into a single u32 key (caller falls back to
    the modular path).  +2 index margin absorbs f32 floor() slack
    against the f64 host span.
    """
    cell = float(eps) / 2.0
    bits = []
    for s in span_xyz:
        max_idx = int(math.floor(max(float(s), 0.0) / cell)) + 2
        bits.append(max(max_idx.bit_length(), 1))
    if sum(bits) > 31:
        return None
    return tuple(bits)


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


@functools.partial(
    jax.jit,
    static_argnames=(
        "params", "cell_bits", "compact_cap", "max_cells",
        "min_cell_points", "interpret", "_cut",
    ),
)
def exact_extract_graph(
    xyz,
    mask,
    params: ExtractParams = ExtractParams(),
    *,
    cell_bits: tuple,
    compact_cap: int,
    max_cells: int = 65536,
    min_cell_points: int = 1,
    interpret: bool = False,
    _cut: int = 0,
):
    """Exact extraction forward step (see module docstring).

    xyz f32[N,3] centered coords (N a multiple of 32768), mask bool[N];
    compact_cap: survivor capacity (multiple of 32768, <= N);
    cell_bits: static per-axis key widths from exact_cell_plan().

    Returns a dict:
      per-cluster stats [K] (count, alive, centroid, center, extent,
      angle, north_angle, aabb_min, aabb_max, overflow) + accepted[K];
      labels_sorted i32[C] (cluster id / -1) and rows_sorted i32[C]
      (original row index; only rows < compact_count are meaningful);
      scalars: base_height, used_retry (bool), compact_count (i32, TRUE
      survivor count — > compact_cap means the tail was dropped),
      cells_overflow (f32: dense cells beyond max_cells + 1.0 if the
      compaction capacity overflowed).
    """
    from pointcloudhookup_tpu.models.towers import filter_and_dedup

    n = xyz.shape[0]
    m = max_cells
    c = compact_cap
    gp = params.ground
    cp = params.cluster
    on_tpu_kernels = jax.default_backend() == "tpu" and not interpret
    if on_tpu_kernels and (n % _COMPACT_BLOCK or c % _COMPACT_BLOCK):
        # the compaction kernel's block constraint; the XLA reference
        # path (CPU tests) takes any size
        raise ValueError(
            f"N={n} and compact_cap={c} must be multiples of {_COMPACT_BLOCK}"
        )
    if m % 1024:
        raise ValueError(f"max_cells {m} must be a multiple of 1024")
    if sum(cell_bits) > 31:
        raise ValueError(f"cell_bits {cell_bits} exceed 31 bits")
    on_tpu = on_tpu_kernels
    big = jnp.float32(3.0e38)
    eps = jnp.float32(cp.eps)
    cell = eps / 2.0

    # ---- exact ground base + cut (reference semantics:
    # /root/reference/utils/tower_extraction.py:83-89)
    z = xyz[:, 2]
    base = masked_percentile_bisect(z, mask, gp.percentile)
    keep0 = mask & (z > base + jnp.float32(gp.offset))
    n0 = jnp.sum(keep0.astype(jnp.int32))
    used_retry = n0 < gp.min_points_after
    keep = jnp.where(
        used_retry, mask & (z > base + jnp.float32(gp.retry_offset)), keep0
    )

    # _cut: cumulative-profiling early exits (scripts/profile_exact.py)
    if _cut == 1:
        return dict(base=base, keep=keep)

    # ---- compact survivors (raw coords + original row index)
    if on_tpu:
        from pointcloudhookup_tpu.ops.pallas.compactrows import (
            compact_rows_multi,
        )
    else:
        from pointcloudhookup_tpu.ops.pallas.compactrows import (
            compact_rows_multi_reference as compact_rows_multi,
        )
    idx = jnp.arange(n, dtype=jnp.int32)
    xb = lax.bitcast_convert_type(xyz[:, 0], jnp.int32)
    yb = lax.bitcast_convert_type(xyz[:, 1], jnp.int32)
    zb = lax.bitcast_convert_type(z, jnp.int32)
    (xb, yb, zb, rows_c), cnt = compact_rows_multi(keep, (xb, yb, zb, idx), c)
    compact_over = (cnt > jnp.int32(c)).astype(jnp.float32)
    xs0 = lax.bitcast_convert_type(xb, jnp.float32)
    ys0 = lax.bitcast_convert_type(yb, jnp.float32)
    zs0 = lax.bitcast_convert_type(zb, jnp.float32)
    valid0 = jnp.arange(c, dtype=jnp.int32) < jnp.minimum(cnt, jnp.int32(c))

    if _cut == 2:
        return dict(xs0=xs0, cnt=cnt)

    # ---- cell keys: identical assignment arithmetic to grid_dbscan
    # (floor((p - mn) / (eps/2)) against the kept-set f32 min corner)
    mn = jnp.stack(
        [
            jnp.min(jnp.where(valid0, v, big))
            for v in (xs0, ys0, zs0)
        ]
    )
    i0 = jnp.floor((xs0 - mn[0]) / cell).astype(jnp.int32)
    i1 = jnp.floor((ys0 - mn[1]) / cell).astype(jnp.int32)
    i2 = jnp.floor((zs0 - mn[2]) / cell).astype(jnp.int32)
    ck = interleave_tight(i0, i1, i2, cell_bits)
    ck = jnp.where(valid0, ck, _KEY_SENTINEL)

    # ---- ONE single-key sort; coordinates + original rows as payloads
    ck_s, xs, ys, zs, rows_s = lax.sort(
        (ck, xs0, ys0, zs0, rows_c), num_keys=1
    )
    if _cut == 3:
        return dict(ck_s=ck_s, xs=xs)

    valid_s = ck_s != _KEY_SENTINEL
    c_start = (ck_s != jnp.roll(ck_s, 1)).at[0].set(True)

    # ---- per-cell population -> dense-cell start flags
    ctot = segmented_scan(
        jnp.add, valid_s.astype(jnp.int32), c_start, reverse=True
    )
    dense_start = c_start & valid_s & (ctot >= jnp.int32(min_cell_points))

    # ---- pack the dense-cell table
    if on_tpu:
        from pointcloudhookup_tpu.ops.pallas.compactrows import compact_rows

        mcap = _round_up(max(m, _COMPACT_BLOCK), _COMPACT_BLOCK)
        pos = jnp.arange(c, dtype=jnp.int32)
        rows_packed, _, _ = compact_rows(dense_start, pos, pos, mcap)
        rows_m = jnp.minimum(rows_packed[:m], jnp.int32(c - 1))
    else:
        csum = jnp.cumsum(dense_start.astype(jnp.int32))
        rows_m = jnp.clip(
            jnp.searchsorted(
                csum, jnp.arange(1, m + 1, dtype=jnp.int32), side="left"
            ),
            0,
            c - 1,
        ).astype(jnp.int32)
    n_dense = jnp.sum(dense_start.astype(jnp.int32))
    cell_alive = jnp.arange(m, dtype=jnp.int32) < n_dense
    ccount = jnp.where(cell_alive, ctot[rows_m].astype(jnp.float32), 0.0)
    # cell centers relative to mn, recomputed from a member coordinate
    # with the SAME f32 arithmetic as the assignment above (no key
    # decode needed — the start row's point is in the cell by definition)
    px, py, pz = xs[rows_m], ys[rows_m], zs[rows_m]
    cij = jnp.stack(
        [
            jnp.floor((px - mn[0]) / cell),
            jnp.floor((py - mn[1]) / cell),
            jnp.floor((pz - mn[2]) / cell),
        ],
        axis=1,
    )
    centers = (cij + 0.5) * cell
    centers = jnp.where(cell_alive[:, None], centers, big)

    if _cut == 4:
        return dict(centers=centers, ccount=ccount)

    # ---- fused cell-graph clustering (pop + min-label + border)
    eps2 = eps * eps
    labels0 = jnp.arange(m, dtype=jnp.int32)
    if on_tpu:
        from pointcloudhookup_tpu.ops.pallas.cluster_converge import (
            cluster_cells,
        )
    else:
        from pointcloudhookup_tpu.ops.pallas.cluster_converge import (
            cluster_cells_reference as cluster_cells,
        )
    cell_labels, _pop = cluster_cells(
        centers, ccount, cell_alive, labels0, eps2, cp.min_points
    )
    cell_labels = compact_labels(cell_labels, jnp.int32(m))

    if _cut == 5:
        return dict(cell_labels=cell_labels)

    # ---- per-row labels: packed index by cumsum, density flag by a
    # forward fill, ONE [C] gather from the m-table (no scatter)
    pidx_row = jnp.cumsum(dense_start.astype(jnp.int32)) - 1
    df_row = segmented_scan(
        jnp.maximum, dense_start.astype(jnp.int32), c_start
    )
    in_table = (df_row == 1) & (pidx_row >= 0) & (pidx_row < m)
    lab_row = cell_labels[jnp.clip(pidx_row, 0, m - 1)]
    labels_s = jnp.where(valid_s & in_table & (lab_row >= 0), lab_row, -1)

    if _cut == 6:
        return dict(labels_s=labels_s)

    # ---- sort-free OBB over the raw coordinates + acceptance filters
    if on_tpu:
        from pointcloudhookup_tpu.ops.pallas.obb_accum import (
            obb_accumulate_xyz,
        )

        acc = obb_accumulate_xyz(
            xs, ys, zs, labels_s, max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
        )
    else:
        from pointcloudhookup_tpu.ops.pallas.obb_accum import (
            obb_accumulate_xyz_reference,
        )

        acc = obb_accumulate_xyz_reference(
            xs, ys, zs, labels_s, max_clusters=params.max_clusters,
            num_angles=params.obb_angles,
        )
    from pointcloudhookup_tpu.ops.obb import _obb_from_accum

    stats = _obb_from_accum(acc, params.max_clusters, params.obb_angles)
    accepted = filter_and_dedup(stats, params.filters)

    cells_overflow = (
        jnp.maximum(n_dense - jnp.int32(m), 0).astype(jnp.float32)
        + compact_over
    )
    return dict(
        accepted=accepted,
        labels_sorted=labels_s,
        rows_sorted=rows_s,
        base_height=base,
        used_retry=used_retry,
        compact_count=cnt,
        cells_overflow=cells_overflow,
        **stats,
    )
