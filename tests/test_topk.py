"""exact_topk == lax.top_k contract (set, order, ties, padding, vmap)."""

import jax
import jax.numpy as jnp
import numpy as np

from sm3det_tpu.ops.topk import exact_topk


def test_exact_topk_matches_lax_topk_random():
    rng = np.random.RandomState(0)
    for n, k in [(1000, 100), (17931, 2000), (4843 * 37, 2000)]:
        s = rng.uniform(0, 1, n).astype(np.float32)
        gv, gi = exact_topk(jnp.asarray(s), k)
        rv, ri = jax.lax.top_k(jnp.asarray(s), k)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))


def test_exact_topk_ties_and_neg_inf_padding():
    rng = np.random.RandomState(1)
    s = rng.uniform(0, 1, 5000).astype(np.float32)
    s[100:2600] = 0.5                    # 2500-way tie straddles k
    s[4000:] = -np.inf                   # padding tail
    gv, gi = exact_topk(jnp.asarray(s), 2000)
    rv, ri = jax.lax.top_k(jnp.asarray(s), 2000)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))

    # k larger than the finite count: -inf entries selected, by index
    gv, gi = exact_topk(jnp.asarray(s), 4500)
    rv, ri = jax.lax.top_k(jnp.asarray(s), 4500)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
    assert np.isneginf(np.asarray(gv)[-100:]).all()


def test_exact_topk_unordered_same_set():
    rng = np.random.RandomState(2)
    s = rng.uniform(0, 1, 30000).astype(np.float32)
    _, gi = exact_topk(jnp.asarray(s), 1500, ordered=False)
    _, ri = jax.lax.top_k(jnp.asarray(s), 1500)
    assert set(np.asarray(gi).tolist()) == set(np.asarray(ri).tolist())
    gi = np.asarray(gi)
    assert (np.sort(gi) == gi).all()     # ascending-index order


def test_exact_topk_vmap_matches():
    rng = np.random.RandomState(3)
    s = rng.uniform(0, 1, (8, 13343)).astype(np.float32)
    gv, gi = jax.vmap(lambda x: exact_topk(x, 2000))(jnp.asarray(s))
    rv, ri = jax.vmap(lambda x: jax.lax.top_k(x, 2000))(jnp.asarray(s))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))


def test_exact_topk_k_ge_n_falls_back():
    s = jnp.asarray(np.random.RandomState(4).uniform(0, 1, 64),
                    dtype=jnp.float32)
    gv, gi = exact_topk(s, 64)
    rv, ri = jax.lax.top_k(s, 64)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
