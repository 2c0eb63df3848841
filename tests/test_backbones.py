"""LSKNet / VAN backbone tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp

from sm3det_tpu.models.backbones.lsknet import LSKNetMoE
from sm3det_tpu.models.backbones.van import VANMoE


def _run(model, img_hw=64, train=True):
    x = jnp.zeros((1, img_hw, img_hw, 3))
    rngs = {"params": jax.random.PRNGKey(0),
            "moe_noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, train=train)
    return model.apply(variables, x, train=train,
                       rngs={"moe_noise": jax.random.PRNGKey(3),
                             "dropout": jax.random.PRNGKey(4)})


def test_lsknet_moe_forward():
    model = LSKNetMoE(embed_dims=(8, 16, 32, 64), depths=(1, 1, 2, 1),
                      moe_block_inds_fc1=((), (), (0,), ()),
                      moe_block_inds_fc2=((), (), (), (0,)),
                      num_experts=2, top_k=2, multi_input=True)
    feats, gate_loss = _run(model)
    assert len(feats) == 4
    assert feats[0].shape == (1, 16, 16, 8)
    assert feats[3].shape == (1, 2, 2, 64)
    assert gate_loss is not None and jnp.isfinite(gate_loss)


def test_lsknet_plain_no_gate_loss():
    model = LSKNetMoE(embed_dims=(8, 16, 32, 64), depths=(1, 1, 1, 1))
    feats, gate_loss = _run(model, train=False)
    assert gate_loss is None
    assert all(jnp.isfinite(f).all() for f in feats)


def test_van_moe_forward():
    model = VANMoE(embed_dims=(8, 16, 32, 64), depths=(1, 1, 2, 1),
                   moe_block_inds_fc1=((), (), (1,), ()),
                   num_experts=2, top_k=1, multi_input=True)
    feats, gate_loss = _run(model)
    assert len(feats) == 4
    assert feats[1].shape == (1, 8, 8, 16)
    assert gate_loss is not None and jnp.isfinite(gate_loss)
