"""No-drop grouped-GEMM MoE inference path (round 5).

The grouped path must reproduce the reference SparseDispatcher's
unbounded semantics (``convnext_moe.py:250-293``): every (token, choice)
route contributes — no capacity drops. Oracles:
  1. dense per-token loop over the top-k experts (drop-free by
     construction),
  2. the capacity path at cf >= E (capacity >= N*k: provably no drops),
  3. the Pallas kernel in interpret mode vs the jnp tile-gather
     reference.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sm3det_tpu.models.moe import MoELayer


def _make(n=200, d=64, e=4, k=2, hid=128, seed=0, skew=None):
    layer = MoELayer(dim=d, hidden=hid, num_experts=e, top_k=k,
                     gating="cosine", capacity_factor=1.5)
    x = jnp.asarray(np.random.RandomState(seed).randn(n, d)
                    .astype(np.float32))
    params = layer.init({"params": jax.random.PRNGKey(0),
                         "moe_noise": jax.random.PRNGKey(1)},
                        x, train=True)["params"]
    if skew is not None:
        # bias the cosine gate toward one expert -> heavily imbalanced
        # groups (multi-tile groups + empty experts)
        sim = np.array(params["w_gate"]["sim_matrix"], copy=True)
        sim[:, skew] += 1.0
        params = dict(params, w_gate=dict(
            params["w_gate"], sim_matrix=jnp.asarray(sim)))
    return layer, x, params


def _dense_oracle(layer, x, params):
    """Drop-free per-token reference computed from raw params."""
    e, k = layer.num_experts, layer.top_k
    ex = params["experts"]
    cg = params["w_gate"]
    proj = x @ cg["cosine_projector"]["kernel"] + \
        cg["cosine_projector"]["bias"]
    proj = proj / jnp.maximum(
        jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
    sim = cg["sim_matrix"] / jnp.maximum(
        jnp.linalg.norm(cg["sim_matrix"], axis=0, keepdims=True), 1e-12)
    logits = (proj @ sim) * jnp.exp(jnp.minimum(
        cg["temperature"], float(np.log(1 / 0.01))))
    tv, ti = jax.lax.top_k(logits, k)
    g = jax.nn.softmax(tv, -1)

    def ffn(xt, ei):
        h = jax.nn.gelu(xt @ ex["w1"][ei] + ex["b1"][ei],
                        approximate=False)
        return h @ ex["w2"][ei] + ex["b2"][ei]

    y = jnp.zeros_like(x)
    for c in range(k):
        y = y + jax.vmap(lambda xt, ei, gi: ffn(xt, ei) * gi)(
            x, ti[:, c], g[:, c])
    return y


@pytest.mark.parametrize("skew", [None, 2])
def test_grouped_matches_dense_reference(skew):
    layer, x, params = _make(skew=skew)
    y, aux = layer.apply({"params": params}, x, train=False)
    y_ref = _dense_oracle(layer, x, params)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)


def test_grouped_equals_capacity_when_capacity_unbounded(monkeypatch):
    layer, x, params = _make()
    y_g, _ = layer.apply({"params": params}, x, train=False)
    monkeypatch.setenv("SM3DET_MOE_GROUPGEMM", "0")
    cap_layer = MoELayer(dim=layer.dim, hidden=layer.hidden,
                         num_experts=layer.num_experts, top_k=layer.top_k,
                         gating="cosine",
                         capacity_factor=float(layer.num_experts))
    y_c, _ = cap_layer.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_c),
                               atol=1e-6)


def test_grouped_keeps_routes_the_capacity_path_drops(monkeypatch):
    """With a skewed gate and cf=1.0 the capacity path drops routes
    (outputs differ from dense); the grouped path must not."""
    layer, x, params = _make(skew=1)
    y_ref = _dense_oracle(layer, x, params)
    monkeypatch.setenv("SM3DET_MOE_GROUPGEMM", "0")
    tight = MoELayer(dim=layer.dim, hidden=layer.hidden,
                     num_experts=layer.num_experts, top_k=layer.top_k,
                     gating="cosine", capacity_factor=1.0)
    y_c, _ = tight.apply({"params": params}, x, train=False)
    assert float(jnp.abs(y_c - y_ref).max()) > 1e-4  # capacity drops
    monkeypatch.setenv("SM3DET_MOE_GROUPGEMM", "1")
    y_g, _ = tight.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_interpret_matches_jnp_ref(dtype):
    from sm3det_tpu.ops.pallas.moe_groupgemm_kernel import (
        moe_ffn_grouped, moe_ffn_grouped_ref)
    rng = np.random.RandomState(3)
    e, d, h, tile, t = 3, 128, 256, 128, 6
    s = tile * t
    x = jnp.asarray(rng.randn(s, d), dtype)
    te = jnp.asarray([0, 0, 1, 1, 1, 2], jnp.int32)
    w1 = jnp.asarray(rng.randn(e, d, h) * 0.05, dtype)
    b1 = jnp.asarray(rng.randn(e, h) * 0.05, dtype)
    w2 = jnp.asarray(rng.randn(e, h, d) * 0.05, dtype)
    b2 = jnp.asarray(rng.randn(e, d) * 0.05, dtype)
    out_k = moe_ffn_grouped(x, te, w1, b1, w2, b2, interpret=True)
    out_r = moe_ffn_grouped_ref(x, te, w1, b1, w2, b2)
    assert out_k.dtype == out_r.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_r, np.float32),
        atol=(1e-5 if dtype == jnp.float32 else 5e-2))


def test_train_path_unchanged_by_env(monkeypatch):
    """Training always uses the capacity path (static grad shapes, EP
    sharding): the env knob must not affect it."""
    layer, x, params = _make()
    rngs = {"moe_noise": jax.random.PRNGKey(7)}
    y1, aux1 = layer.apply({"params": params}, x, train=True, rngs=rngs)
    monkeypatch.setenv("SM3DET_MOE_GROUPGEMM", "0")
    y2, aux2 = layer.apply({"params": params}, x, train=True, rngs=rngs)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0)
    assert float(aux1) == float(aux2)
