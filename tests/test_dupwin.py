"""ops/pallas/dupwin.py: windowed first-occurrence flags must equal the
numpy oracle, and deliver the cell-mode guarantee: exact voxel dedup
for every cell run <= depth+1."""

import numpy as np
import pytest

from pointcloudhookup_tpu.ops.pallas.dupwin import (
    _BLOCK,
    first_occurrence_flags,
    first_occurrence_flags_reference,
)


def _make(n, max_run, dup_frac, seed=0):
    """k1 runs of random length; w values drawn with duplicates."""
    rng = np.random.default_rng(seed)
    runs = []
    total = 0
    while total < n:
        r = int(rng.integers(1, max_run + 1))
        runs.append(min(r, n - total))
        total += runs[-1]
    k1 = np.repeat(np.cumsum(rng.integers(1, 5, len(runs))), runs).astype(
        np.uint32
    )[:n]
    # small w alphabet inside runs so duplicates actually occur
    hi = max(2, int(max_run * (1.0 - dup_frac)))
    w = rng.integers(0, hi, n).astype(np.int32)
    return k1, w


@pytest.mark.parametrize("max_run,dup_frac", [(1, 0.0), (5, 0.5), (40, 0.3), (65, 0.6)])
def test_matches_oracle(max_run, dup_frac):
    import jax.numpy as jnp

    n = 2 * _BLOCK
    k1, w = _make(n, max_run, dup_frac, seed=max_run)
    got = np.asarray(
        first_occurrence_flags(
            jnp.asarray(k1), jnp.asarray(w), depth=64, interpret=True
        )
    )
    np.testing.assert_array_equal(
        got, first_occurrence_flags_reference(k1, w, depth=64)
    )


def test_guarantee_runs_le_depth_plus_1():
    """For runs <= D+1 the flags are TRUE first-occurrence flags."""
    import jax.numpy as jnp

    n = 2 * _BLOCK
    depth = 64
    k1, w = _make(n, depth + 1, 0.5, seed=9)
    got = np.asarray(
        first_occurrence_flags(
            jnp.asarray(k1), jnp.asarray(w), depth=depth, interpret=True
        )
    )
    # oracle: true first occurrence within the whole k1-run
    seen = set()
    expect = np.zeros(n, np.int32)
    prev = None
    for i in range(n):
        if k1[i] != prev:
            seen = set()
            prev = k1[i]
        expect[i] = int(w[i] not in seen)
        seen.add(int(w[i]))
    np.testing.assert_array_equal(got, expect)


def test_small_depth_and_validation():
    import jax.numpy as jnp

    k1, w = _make(_BLOCK, 3, 0.5, seed=2)
    got = np.asarray(
        first_occurrence_flags(
            jnp.asarray(k1), jnp.asarray(w), depth=2, interpret=True
        )
    )
    np.testing.assert_array_equal(
        got, first_occurrence_flags_reference(k1, w, depth=2)
    )
    with pytest.raises(ValueError):
        first_occurrence_flags(jnp.asarray(k1[:100]), jnp.asarray(w[:100]))
    with pytest.raises(ValueError):
        first_occurrence_flags(jnp.asarray(k1), jnp.asarray(w), depth=128)
