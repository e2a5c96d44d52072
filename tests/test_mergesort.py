"""ops/pallas/mergesort.py: the two-level merge sort must produce
ARRAYS IDENTICAL to lax.sort((hi, lo), num_keys=2) — the pair is the
whole record, so lexicographic content equality is full correctness."""

import numpy as np
import pytest
from jax import lax
import jax.numpy as jnp

from pointcloudhookup_tpu.ops.pallas.mergesort import (
    merge_sort_2key,
    merge_sort_eligible,
)


def _check(hi, lo, block):
    got_h, got_l = merge_sort_2key(
        jnp.asarray(hi), jnp.asarray(lo), block=block, interpret=True
    )
    exp_h, exp_l = lax.sort(
        (jnp.asarray(hi), jnp.asarray(lo)), num_keys=2
    )
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(exp_h))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(exp_l))


def _rand(n, hi_max, lo_max, seed):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, hi_max, n).astype(np.int32),
        rng.integers(0, lo_max, n).astype(np.int32),
    )


@pytest.mark.parametrize("block", [2048, 4096])
def test_random_pairs(block):
    hi, lo = _rand(16384, 1 << 30, 1 << 30, 0)
    _check(hi, lo, block)


def test_heavy_duplicates():
    # many equal hi keys force the lo word to decide ordering
    hi, lo = _rand(8192, 7, 1 << 30, 1)
    _check(hi, lo, 2048)


def test_all_equal():
    n = 8192
    _check(np.full(n, 5, np.int32), np.full(n, 9, np.int32), 2048)


def test_presorted_and_reversed():
    n = 8192
    hi = np.arange(n, dtype=np.int32)
    lo = np.zeros(n, np.int32)
    _check(hi, lo, 2048)
    _check(hi[::-1].copy(), lo, 2048)


def test_sentinel_heavy():
    # the frontend's masked rows: 80% (SENTINEL_HI, garbage)
    n = 16384
    hi, lo = _rand(n, 1 << 30, 1 << 30, 2)
    rng = np.random.default_rng(3)
    m = rng.random(n) < 0.8
    hi[m] = 0x7FFFFFFF
    _check(hi, lo, 2048)


def test_morton_like_clustered():
    # spatially clustered codes: long runs of near-equal keys
    n = 16384
    rng = np.random.default_rng(4)
    base = np.repeat(rng.integers(0, 1 << 20, 64), n // 64)
    hi = (base + rng.integers(0, 3, n)).astype(np.int32)
    lo = rng.integers(0, 1 << 10, n).astype(np.int32)
    _check(hi, lo, 2048)


def test_single_merge_round():
    # n == 2*block: exactly one round, both tiles of one pair
    hi, lo = _rand(4096, 1 << 30, 1 << 30, 5)
    _check(hi, lo, 2048)


def test_skewed_coranks():
    # every element of run A < every element of run B and vice versa:
    # merge-path splits hit the la=0 / lb=0 edges
    n = 8192
    hi = np.concatenate(
        [np.arange(4096), 1000000 + np.arange(4096)]
    ).astype(np.int32)
    lo = np.zeros(n, np.int32)
    _check(hi, lo, 2048)
    _check(hi[::-1].copy(), lo, 2048)


def test_eligibility():
    assert merge_sort_eligible(4 * 1024 * 1024)
    assert not merge_sort_eligible(3000000)  # not pow2
    assert not merge_sort_eligible(8192, block=8192)  # single block
    # ineligible n falls back to lax.sort silently
    hi, lo = _rand(3000, 1 << 30, 1 << 30, 6)
    got_h, got_l = merge_sort_2key(
        jnp.asarray(hi), jnp.asarray(lo), interpret=True
    )
    exp_h, exp_l = lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(exp_h))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(exp_l))
