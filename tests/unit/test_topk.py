"""exact_top_k_wide vs lax.top_k — bit-identical values, indices, tie order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.ops.topk import exact_top_k_wide


def _both(x, k, block_size):
    """Reference + ours in ONE jitted program (eager exact_top_k_wide costs
    ~8 tiny XLA compiles per call; this suite sweeps many shapes)."""
    return jax.jit(
        lambda a: (jax.lax.top_k(a, k), exact_top_k_wide(a, k, block_size))
    )(x)


@pytest.mark.parametrize("width,block", [
    (100, 16),          # pad, many blocks
    (4096, 256),        # exact multiple
    (4097, 256),        # one column into a new block
    (513, 64),
    (200, 4096),        # narrower than one block -> passthrough
])
@pytest.mark.parametrize("k", [1, 5, 12])
def test_matches_lax_top_k_random(width, block, k):
    x = jax.random.normal(jax.random.PRNGKey(width * 31 + k), (7, width))
    (ref_v, ref_i), (got_v, got_i) = _both(x, k, block)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_tie_ordering_matches_lowest_index():
    # Heavy ties within and across blocks: top_k breaks ties by lowest index.
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 4, size=(5, 1000)).astype(np.float32))
    (ref_v, ref_i), (got_v, got_i) = _both(x, 9, 64)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_multidim_batch_and_jit():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 700))
    f = jax.jit(lambda a: exact_top_k_wide(a, 4, block_size=128))
    got_v, got_i = f(x)
    ref_v, ref_i = jax.lax.top_k(x, 4)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_k_wider_than_block():
    # kb = min(k, block_size): k larger than the block size still works.
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 300))
    (ref_v, ref_i), (got_v, got_i) = _both(x, 40, 32)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_k_exceeding_width_raises():
    with pytest.raises(ValueError):
        exact_top_k_wide(jnp.zeros((2, 8)), 9)


def test_values_survive_neg_inf_rows():
    # Rows holding -inf entries: values must still match lax.top_k exactly
    # (indices may reorder only among tied -inf entries).
    x = np.full((3, 500), -np.inf, np.float32)
    x[0, 17] = 1.0
    x[1, 499] = 2.0
    x[1, 3] = -1.0
    (ref_v, _), (got_v, got_i) = _both(jnp.asarray(x), 5, 64)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    assert int(np.asarray(got_i).max()) < 500
