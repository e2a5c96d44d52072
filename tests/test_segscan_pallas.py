"""One-pass Pallas segmented scan vs the XLA Hillis-Steele oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from pointcloudhookup_tpu.ops.pallas.segscan import segmented_scan_pallas
from pointcloudhookup_tpu.ops.segments import _segmented_scan_fwd


def _oracle(op, values, is_start, reverse=False):
    flags = is_start
    if reverse:
        flags = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
        return _segmented_scan_fwd(op, values[::-1], flags[::-1])[::-1]
    return _segmented_scan_fwd(op, values, flags)


def _case(rng, n, dtype):
    if dtype == np.int32:
        v = rng.integers(-50, 50, n).astype(np.int32)
    else:
        v = rng.normal(0, 10, n).astype(np.float32)
    s = rng.random(n) < 0.01
    s[0] = True
    return jnp.asarray(v), jnp.asarray(s)


@pytest.mark.heavy
def test_segscan_all_ops_match_oracle(rng):
    n = 65536  # 2 blocks of 32768: exercises the cross-block carry
    for dtype in (np.int32, np.float32):
        v, s = _case(rng, n, dtype)
        for name, op in [("add", jnp.add), ("max", jnp.maximum), ("min", jnp.minimum)]:
            for reverse in (False, True):
                got = segmented_scan_pallas(
                    v, s, op=name, reverse=reverse, interpret=True
                )
                want = _oracle(op, v, s, reverse=reverse)
                if dtype == np.float32 and name == "add":
                    np.testing.assert_allclose(
                        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4,
                        err_msg=f"{name} reverse={reverse} {dtype}",
                    )
                else:
                    np.testing.assert_array_equal(
                        np.asarray(got), np.asarray(want),
                        err_msg=f"{name} reverse={reverse} {dtype}",
                    )


def test_segscan_segment_spanning_blocks(rng):
    """One segment covering the whole array: the carry must thread
    through every block boundary."""
    n = 3 * 32768
    v = jnp.ones(n, jnp.int32)
    s = jnp.zeros(n, bool).at[0].set(True)
    got = segmented_scan_pallas(v, s, op="add", interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.arange(1, n + 1, dtype=np.int32)
    )
    # reverse: totals accumulate toward the front
    got_r = segmented_scan_pallas(v, s, op="add", reverse=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got_r), np.arange(n, 0, -1, dtype=np.int32)
    )


def test_segments_dispatch_falls_back_off_tpu(rng):
    """On CPU the public segmented_scan must keep using the XLA path
    (and stay correct) for any size."""
    from pointcloudhookup_tpu.ops.segments import segmented_scan

    v = jnp.asarray(rng.integers(0, 9, 1000).astype(np.int32))
    s = jnp.zeros(1000, bool).at[jnp.asarray([0, 17, 500])].set(True)
    got = segmented_scan(jnp.add, v, s, reverse=True)
    want = _oracle(jnp.add, v, s, reverse=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
