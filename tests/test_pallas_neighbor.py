import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudhookup_tpu.ops.pallas.neighbor import (
    neighbor_reduce,
    neighbor_reduce_reference,
)

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("m", [512, 1024])
def test_neighbor_reduce_matches_reference(rng, m):
    xyz = rng.normal(0, 50, size=(m, 3)).astype(np.float32)
    labels = rng.integers(0, m, m).astype(np.int32)
    weights = rng.uniform(0, 3, m).astype(np.float32)
    allowed = rng.uniform(size=m) > 0.3
    eps2 = 400.0
    pop, lmin = neighbor_reduce(
        jnp.asarray(xyz), jnp.asarray(labels), jnp.asarray(weights),
        jnp.asarray(allowed), eps2, block_m=256, block_k=256,
        interpret=INTERPRET,
    )
    pop_r, lmin_r = neighbor_reduce_reference(
        jnp.asarray(xyz), jnp.asarray(labels), jnp.asarray(weights),
        jnp.asarray(allowed), eps2,
    )
    np.testing.assert_allclose(np.asarray(pop), np.asarray(pop_r), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(lmin), np.asarray(lmin_r))


def test_neighbor_reduce_no_neighbors(rng):
    xyz = (np.arange(512)[:, None] * np.array([1000.0, 0, 0])).astype(np.float32)
    labels = np.arange(512, dtype=np.int32)
    pop, lmin = neighbor_reduce(
        jnp.asarray(xyz), jnp.asarray(labels),
        jnp.ones(512, jnp.float32), jnp.zeros(512, bool), 1.0,
        block_m=256, block_k=256, interpret=INTERPRET,
    )
    assert (np.asarray(pop) == 0).all()
    assert (np.asarray(lmin) == 512).all()
