"""Scatter-free segment reductions over SORTED data.

TPU scatters serialize per update row, so `jax.ops.segment_*` over
millions of points is pathologically slow; but this pipeline's segments
(voxel cells, grid cells, cluster members) always come from a device
sort, which makes every reduction expressible with sort-native
primitives that vectorize perfectly on the VPU:

  * boundary flags + prefix sums give segment ids;
  * forward/backward monotone scans give each row its segment's start
    and one-past-end positions;
  * per-segment sums = cumulative-sum differences at the boundaries;
  * per-segment max/min = segmented associative scans (flag-reset op);
  * packing a bounded table of segments = ONE more sort by packed index
    instead of a scatter.

These are the building blocks for ops/voxel.py, ops/cluster_grid.py and
ops/obb.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def boundary_flags(*keys):
    """is_start[i]: row i begins a new segment in key-sorted order."""
    n = keys[0].shape[0]
    flag = jnp.zeros(n, bool)
    for k in keys:
        flag = flag | (k != jnp.roll(k, 1))
    return flag.at[0].set(True)


def segment_spans(is_start):
    """For each row of sorted data: (start, nxt) where start is the
    first row of its segment and nxt is one past the last.

    Native lax.cummax/cummin (not the generic associative_scan): XLA
    has a dedicated cumulative-op lowering that compiles in seconds
    where the recursive associative_scan graph takes minutes at
    corridor sizes, and runs at memcpy speed."""
    n = is_start.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    start = lax.cummax(jnp.where(is_start, iota, -1), axis=0)
    behind = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
    nxt = lax.cummin(jnp.where(behind, iota + 1, n), axis=0, reverse=True)
    return start, nxt


def segment_sum_rows(values, is_start, nxt):
    """Per-row: sum of `values` over the row's whole segment.
    values: [N] or [N, C].

    Uses a segmented (boundary-resetting) scan rather than a global
    cumsum difference: global prefixes of millions of coordinates
    cancel catastrophically in f32, while segment-local accumulation
    keeps full precision for the short segments this pipeline produces.
    """
    scan = segmented_scan(jnp.add, values, is_start)
    n = values.shape[0]
    end = jnp.clip(nxt - 1, 0, n - 1)
    return scan[end]


def segmented_scan(op, values, is_start, reverse: bool = False):
    """Segmented inclusive scan of `op` (e.g. jnp.maximum) along axis 0,
    restarting at each is_start row (or segment end if reverse)."""

    def combine(a, b):
        fa, va = a
        fb, vb = b
        f = fa | fb
        if values.ndim == 2:
            v = jnp.where(fb[:, None], vb, op(va, vb))
        else:
            v = jnp.where(fb, vb, op(va, vb))
        return f, v

    flags = is_start
    if reverse:
        # reset flags for a backward scan are the segment-END rows
        flags = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
    _, out = lax.associative_scan(combine, (flags, values), axis=0, reverse=reverse)
    return out


def segment_sum_starts(weights, is_start, spans=None):
    """Per-segment totals of integer `weights`, valid at START rows
    (other rows carry garbage).  One native cumsum + the segment spans
    + one monotone gather — compiles in seconds where the tupled
    reverse segmented scan takes minutes at corridor sizes.  Exact for
    integer weights (use an integer dtype; f32 prefix sums of counts
    stay exact only below 2^24)."""
    start, nxt = segment_spans(is_start) if spans is None else spans
    csum = jnp.cumsum(weights, axis=0)
    prev = jnp.concatenate([jnp.zeros((1,) + csum.shape[1:], csum.dtype), csum[:-1]])
    return csum[nxt - 1] - prev


def segment_fill_from_starts(values_at_start, is_start, start=None):
    """Per-row: the value `values_at_start` carries at the row's
    segment-START row (forward fill across each segment).  One native
    cummax + one gather instead of a segmented max scan."""
    n = is_start.shape[0]
    if start is None:
        iota = jnp.arange(n, dtype=jnp.int32)
        start = lax.cummax(jnp.where(is_start, iota, -1), axis=0)
    return values_at_start[jnp.clip(start, 0, n - 1)]


def segment_max_rows(values, is_start):
    """Per-row: max of `values` over the row's whole segment (forward +
    backward segmented scans combined)."""
    fwd = segmented_scan(jnp.maximum, values, is_start)
    bwd = segmented_scan(jnp.maximum, values, is_start, reverse=True)
    return jnp.maximum(fwd, bwd)


def segment_min_rows(values, is_start):
    fwd = segmented_scan(jnp.minimum, values, is_start)
    bwd = segmented_scan(jnp.minimum, values, is_start, reverse=True)
    return jnp.minimum(fwd, bwd)


def pack_segments(sort_key, payloads, capacity: int):
    """Pack one row per segment into a fixed-size table WITHOUT scatter.

    sort_key: i32[N], `capacity`-clipped packed index at the segment's
    representative rows, >= capacity elsewhere (those rows are dropped).
    payloads: tuple of [N] arrays.  Returns tuple of [capacity] arrays
    (padded rows keep whatever the >=capacity rows carried — mask via a
    payload).  Cost: one `lax.sort` over N rows.
    """
    n = sort_key.shape[0]
    sorted_all = lax.sort((sort_key, *payloads), num_keys=1)
    if capacity <= n:
        return tuple(p[:capacity] for p in sorted_all[1:])
    pad = capacity - n
    return tuple(
        jnp.concatenate([p, jnp.zeros((pad,) + p.shape[1:], p.dtype)])
        for p in sorted_all[1:]
    )
