import numpy as np
import jax.numpy as jnp

from pointcloudhookup_tpu.ops.percentile import (
    histogram_percentile,
    masked_percentile,
)


def test_masked_percentile_matches_numpy(rng):
    x = rng.normal(10.0, 5.0, 3000).astype(np.float32)
    pad = np.zeros(1096, np.float32)
    xp = np.concatenate([x, pad])
    mask = np.concatenate([np.ones(3000, bool), np.zeros(1096, bool)])
    for q in [0.0, 10.0, 25.0, 50.0, 77.3, 100.0]:
        got = float(masked_percentile(jnp.asarray(xp), jnp.asarray(mask), q))
        want = float(np.percentile(x, q))
        assert abs(got - want) < 1e-3, (q, got, want)


def test_masked_percentile_interleaved_mask(rng):
    x = rng.uniform(-5, 5, 1024).astype(np.float32)
    mask = rng.uniform(size=1024) > 0.4
    got = float(masked_percentile(jnp.asarray(x), jnp.asarray(mask), 25.0))
    want = float(np.percentile(x[mask], 25.0))
    assert abs(got - want) < 1e-3


def test_histogram_percentile_approximates(rng):
    x = rng.normal(0.0, 20.0, 20000).astype(np.float32)
    mask = np.ones_like(x, bool)
    got = float(histogram_percentile(jnp.asarray(x), jnp.asarray(mask), 25.0))
    want = float(np.percentile(x, 25.0))
    span = x.max() - x.min()
    assert abs(got - want) < span / 4096 * 2


def test_bisect_percentile_matches_sort_based(rng):
    from pointcloudhookup_tpu.ops.percentile import masked_percentile_bisect

    for trial in range(12):
        n = int(rng.integers(2, 4000))
        x = rng.normal(scale=100, size=n).astype(np.float32)
        if trial % 3 == 0:
            x = np.round(x / 10) * 10  # heavy duplicates
        mask = rng.random(n) < 0.8
        if not mask.any():
            mask[0] = True
        q = float(rng.uniform(0, 100))
        a = float(masked_percentile(jnp.asarray(x), jnp.asarray(mask), q))
        b = float(
            masked_percentile_bisect(jnp.asarray(x), jnp.asarray(mask), q)
        )
        # the two order statistics are identical by construction; the
        # final lerp may differ by an ULP across XLA fusion contexts
        np.testing.assert_allclose(b, a, rtol=1e-6, err_msg=(trial, q))
        want = float(np.percentile(x[mask].astype(np.float64), q))
        assert abs(b - want) < 1e-2, (trial, q, b, want)
