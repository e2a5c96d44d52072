"""Masked percentiles on device.

The reference computes ``np.percentile(z, 25)`` over the whole cloud for
ground filtering (/root/reference/utils/tower_extraction.py:83).  On TPU
we provide:

  * `masked_percentile` — exact, sort-based, matches numpy's 'linear'
    interpolation on the valid subset of a padded buffer.
  * `histogram_percentile` — fixed-cost approximate percentile via a
    sharded-friendly histogram + refinement; used by the multi-device
    path where the global sort would need a gather (see
    pointcloudhookup_tpu/parallel/percentile.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_percentile(x, mask, q):
    """Exact percentile of x[mask], matching np.percentile(..., method='linear').

    x: f32[N]; mask: bool[N]; q: scalar in [0, 100].
    Padded entries are sorted to the end as +inf.  Assumes at least one
    valid element.
    """
    x = jnp.asarray(x)
    n = jnp.sum(mask.astype(jnp.int32))
    xs = jnp.sort(jnp.where(mask, x, jnp.inf))
    h = (n - 1).astype(jnp.float32) * (jnp.float32(q) / 100.0)
    lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = h - lo.astype(jnp.float32)
    return xs[lo] * (1.0 - frac) + xs[hi] * frac


def histogram_counts(x, mask, lo, hi, num_bins):
    """Histogram of x[mask] over [lo, hi] with num_bins bins.

    Values are clipped into range.  Returns i32[num_bins].  This is the
    per-shard building block for the distributed percentile (each shard
    histograms locally, counts are summed with psum).

    Implemented as sort + searchsorted + adjacent difference: a TPU
    scatter-add over millions of updates serializes per element, while a
    device sort runs at ~460 Mpts/s and the 4096 edge searches are
    binary lookups.
    """
    xs = jnp.sort(jnp.where(mask, jnp.clip(x, lo, hi), jnp.inf))
    n = jnp.sum(mask.astype(jnp.int32))
    edges = lo + (hi - lo) * jnp.arange(1, num_bins + 1, dtype=jnp.float32) / num_bins
    cdf = jnp.searchsorted(xs, edges, side="right").astype(jnp.int32)
    cdf = jnp.minimum(cdf, n)  # padding (+inf) never counts
    cdf = cdf.at[-1].set(n)  # top edge owns everything at hi
    return jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), cdf]))


def percentile_from_histogram(counts, lo, hi, q):
    """Approximate percentile from histogram counts (bin-left-edge + linear
    within the selected bin by rank fraction)."""
    num_bins = counts.shape[0]
    total = jnp.sum(counts)
    target = (total - 1).astype(jnp.float32) * (jnp.float32(q) / 100.0)
    cum = jnp.cumsum(counts)
    bin_idx = jnp.searchsorted(cum.astype(jnp.float32), target, side="right")
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)
    prev_cum = jnp.where(bin_idx > 0, cum[jnp.maximum(bin_idx - 1, 0)], 0)
    in_bin = jnp.maximum(counts[bin_idx], 1)
    frac = (target - prev_cum.astype(jnp.float32)) / in_bin.astype(jnp.float32)
    width = (hi - lo) / num_bins
    return lo + (bin_idx.astype(jnp.float32) + jnp.clip(frac, 0.0, 1.0)) * width


def histogram_percentile(x, mask, q, num_bins=4096):
    """Single-shard approximate percentile (histogram method)."""
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(mask, x, big))
    hi = jnp.max(jnp.where(mask, x, -big))
    counts = histogram_counts(x, mask, lo, hi, num_bins)
    return percentile_from_histogram(counts, lo, hi, q)
