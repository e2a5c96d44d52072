"""compact_rows: butterfly-concentrator stream compaction (interpret mode).

Covers the conflict-freeness claim the kernel rests on (monotone rank
routing through an LSB-first XOR-butterfly) across random densities,
plus carry/staging sequencing, sentinel padding, and capacity overflow.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy on a cold 1-core host; quick tier = pytest -m 'not heavy'

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pointcloudhookup_tpu.ops.morton import SENTINEL_HI  # noqa: E402
from pointcloudhookup_tpu.ops.pallas.compactrows import (  # noqa: E402
    _BLOCK,
    _CHUNK,
    compact_rows,
    compact_rows_reference,
)


def _run(keep, hi, lo, cap):
    return compact_rows(
        jnp.asarray(keep), jnp.asarray(hi), jnp.asarray(lo), cap,
        interpret=True,
    )


@pytest.mark.parametrize("p", [0.02, 0.22, 0.93])
def test_random_density(p):
    # one 32k block keeps interpret-mode runtime sane; cross-block carry
    # and multi-chunk emission are covered by test_bursty_runs
    rng = np.random.default_rng(int(p * 100))
    n = _BLOCK
    keep = rng.random(n) < p
    hi = rng.integers(0, 2**30, n, dtype=np.int32)
    lo = rng.integers(0, 2**30, n, dtype=np.int32)
    cap = _CHUNK * ((int(keep.sum()) // _CHUNK) + 1)
    hi_c, lo_c, cnt = _run(keep, hi, lo, cap)
    assert int(cnt) == int(keep.sum())
    k = int(cnt)
    np.testing.assert_array_equal(np.asarray(hi_c[:k]), hi[keep])
    np.testing.assert_array_equal(np.asarray(lo_c[:k]), lo[keep])
    assert (np.asarray(hi_c[k:]) == SENTINEL_HI).all()
    assert (np.asarray(lo_c[k:]) == 0).all()


def test_none_and_all():
    n = _BLOCK
    hi = np.arange(n, dtype=np.int32)
    lo = np.arange(n, dtype=np.int32)[::-1].copy()
    hi_c, lo_c, cnt = _run(np.zeros(n, bool), hi, lo, _CHUNK)
    assert int(cnt) == 0
    assert (np.asarray(hi_c) == SENTINEL_HI).all()
    hi_c, lo_c, cnt = _run(np.ones(n, bool), hi, lo, n)
    assert int(cnt) == n
    np.testing.assert_array_equal(np.asarray(hi_c), hi)
    np.testing.assert_array_equal(np.asarray(lo_c), lo)


def test_bursty_runs():
    # long all-kept runs followed by long all-dropped runs exercise the
    # carry wrap and multi-chunk emission paths
    n = _BLOCK * 4
    keep = np.zeros(n, bool)
    keep[5000:21000] = True
    keep[40000:40001] = True
    keep[90000:130000] = True
    hi = np.arange(n, dtype=np.int32)
    lo = (np.arange(n, dtype=np.int32) * 7) & 0x3FFFFFFF
    cap = _CHUNK * 4
    hi_c, lo_c, cnt = _run(keep, hi, lo, cap)
    assert int(cnt) == int(keep.sum())
    k = min(int(cnt), cap)
    np.testing.assert_array_equal(np.asarray(hi_c[:k]), hi[keep][:k])
    np.testing.assert_array_equal(np.asarray(lo_c[:k]), lo[keep][:k])


def test_capacity_overflow_reports_true_count():
    rng = np.random.default_rng(3)
    n = _BLOCK * 2
    keep = rng.random(n) < 0.8
    hi = rng.integers(0, 2**30, n, dtype=np.int32)
    lo = rng.integers(0, 2**30, n, dtype=np.int32)
    cap = _CHUNK  # deliberately too small
    hi_c, lo_c, cnt = _run(keep, hi, lo, cap)
    assert int(cnt) == int(keep.sum()) > cap
    # the prefix that fits is exact and in order
    np.testing.assert_array_equal(np.asarray(hi_c[:cap]), hi[keep][:cap])


def test_reference_agrees():
    rng = np.random.default_rng(11)
    n = _BLOCK
    keep = rng.random(n) < 0.3
    hi = rng.integers(0, 2**30, n, dtype=np.int32)
    lo = rng.integers(0, 2**30, n, dtype=np.int32)
    cap = _CHUNK * 2
    a = _run(keep, hi, lo, cap)
    b = compact_rows_reference(
        jnp.asarray(keep), jnp.asarray(hi), jnp.asarray(lo), cap
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert int(a[2]) == int(b[2])


def test_validation_errors():
    n = _BLOCK
    z = jnp.zeros(n, jnp.int32)
    with pytest.raises(ValueError, match="multiple"):
        compact_rows(jnp.zeros(n + 1, bool), z, z, _CHUNK, interpret=True)
    with pytest.raises(ValueError, match="multiple"):
        compact_rows(jnp.zeros(n, bool), z, z, _CHUNK + 1, interpret=True)


def test_multi_channel_four():
    # the exact-semantics front-end routes (x, y, z, idx) — four
    # channels sharing one routing computation
    from pointcloudhookup_tpu.ops.pallas.compactrows import (
        compact_rows_multi,
        compact_rows_multi_reference,
    )

    rng = np.random.default_rng(7)
    n = _BLOCK
    keep = rng.random(n) < 0.21
    chans = tuple(
        jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
        for _ in range(4)
    )
    cap = _CHUNK
    comp, cnt = compact_rows_multi(
        jnp.asarray(keep), chans, cap, interpret=True
    )
    ref, rcnt = compact_rows_multi_reference(jnp.asarray(keep), chans, cap)
    assert int(cnt) == int(rcnt) == int(keep.sum())
    for a, b in zip(comp, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
