"""Multi-chip SPMD tests on the virtual 8-device CPU mesh (conftest.py).

The reference's distributed mode is DDP grad all-reduce
(mmcv/mmcv/parallel/distributed.py:33, runner/dist_utils.py:37); here the
equivalent is a ('data','expert') mesh with the batch sharded over 'data'
and MoE expert weights over 'expert' (parallel/mesh.py). These tests
validate the semantics, not just compilation:

- the sharded DP x EP train step produces the SAME losses and the SAME
  updated parameters as the single-device step (XLA psum == DDP
  all-reduce correctness),
- expert-stacked parameters round-trip through the 'expert' sharding,
- the batch leading dim is actually split over 'data'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sm3det_tpu.models.detectors.trisource import TriSourceDetector
from sm3det_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      param_sharding, replicated)
from sm3det_tpu.train.dla import make_dla_config
from sm3det_tpu.train.optim import make_optimizer
from sm3det_tpu.train.train_state import (TrainState, build_train_step,
                                          init_trisource)

from test_train_step import TINY_CFG, tiny_batch

RATIO = (8, 4, 4)  # [2,1,1] x dp=4 replicas


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provision 8 CPU devices"
    return make_mesh(8, expert_parallel=2)


@pytest.fixture(scope="module")
def setup():
    model = TriSourceDetector(cfg=TINY_CFG)
    batch = tiny_batch(n_sar=8, n_rgb=4, n_ifr=4)
    params = init_trisource(jax.random.PRNGKey(0), model, batch,
                            source_ratio=RATIO)
    dla_cfg = make_dla_config(warmup_iters=2)
    init_fn, update_fn, _ = make_optimizer(
        base_lr=1e-3, step_iters=(100,), warmup_iters=2, dla_cfg=dla_cfg)
    state = TrainState(params=params, opt=init_fn(params),
                       rng=jax.random.PRNGKey(1))
    step = build_train_step(model, init_fn, update_fn, source_ratio=RATIO)
    return model, state, step, batch


def test_make_mesh_axes(mesh):
    assert mesh.axis_names == ("data", "expert")
    assert mesh.devices.shape == (4, 2)


def test_expert_param_sharding_roundtrip(mesh, setup):
    _, state, _, _ = setup
    shardings = param_sharding(mesh, state.params)
    sharded = jax.device_put(state.params, shardings)

    # at least one leaf must actually be expert-sharded
    expert_leaves = [
        (s, x) for s, x in zip(jax.tree.leaves(shardings),
                               jax.tree.leaves(sharded))
        if s.spec and s.spec[0] == "expert"]
    assert expert_leaves, "no expert-sharded parameter found"
    for s, x in expert_leaves:
        # leading (expert) axis split over 2 devices
        shard_shapes = {tuple(sh.data.shape) for sh in x.addressable_shards}
        assert all(ss[0] == x.shape[0] // 2 for ss in shard_shapes), (
            x.shape, shard_shapes)

    # values round-trip exactly through the sharding
    orig = jax.tree.leaves(state.params)
    back = jax.tree.leaves(jax.device_get(sharded))
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_sharded_over_data(mesh, setup):
    _, _, _, batch = setup
    sharded = jax.device_put(batch, batch_sharding(mesh, batch))
    img = sharded["sar"]["img"]
    shard_batches = sorted(sh.data.shape[0] for sh in img.addressable_shards)
    assert img.shape[0] == 8 and set(shard_batches) == {2}, shard_batches


def test_sharded_step_matches_single_device(mesh, setup):
    """DP grad psum correctness: the 8-way sharded step must reproduce the
    single-device step's losses AND updated parameters."""
    model, state, step, batch = setup

    # --- single device ---
    ref_state, ref_metrics = jax.jit(step)(state, batch)
    ref_metrics = jax.device_get(ref_metrics)

    # --- sharded over the mesh (the production path) ---
    from sm3det_tpu.train.train_state import shard_train_step
    jstep, sh_state, put_batch = shard_train_step(step, mesh, state, batch,
                                                  donate=False)
    new_state, metrics = jstep(sh_state, put_batch(batch))
    metrics = jax.device_get(metrics)

    for k in ref_metrics:
        assert np.isfinite(metrics[k]), k
        np.testing.assert_allclose(metrics[k], ref_metrics[k],
                                   rtol=1e-3, atol=1e-4, err_msg=k)

    # updated params match. Adam normalizes each update to ~lr (1e-3), so
    # a near-zero gradient whose sign flips under a different reduction
    # order moves a weight by up to 2*lr — exactly like real DDP vs
    # single-GPU. Bound: no weight moved apart by more than 2*lr, and the
    # aggregate drift is tiny.
    ref_leaves = jax.tree.leaves(jax.device_get(ref_state.params))
    sh_leaves = jax.tree.leaves(jax.device_get(new_state.params))
    diffs = [np.abs(a - b) for a, b in zip(ref_leaves, sh_leaves)]
    worst = max(float(d.max()) for d in diffs)
    mean = float(np.mean(np.concatenate([d.ravel() for d in diffs])))
    assert worst < 2e-3, worst
    assert mean < 1e-5, mean

    # and a second sharded step from the sharded state runs fine
    s2, m2 = jstep(new_state, put_batch(batch))
    assert np.isfinite(float(m2["loss"]))


def test_replicated_helper(mesh):
    tree = {"a": jnp.ones((4, 4)), "b": jnp.zeros((3,))}
    sh = replicated(mesh, tree)
    out = jax.device_put(tree, sh)
    for leaf in jax.tree.leaves(out):
        assert len({s.device for s in leaf.addressable_shards}) == 8


@pytest.mark.slow
def test_ep2_step_equals_single_device_at_256px_tiny():
    """EP numeric equality at flagship-ish token counts (VERDICT r3
    item 7): ConvNeXt-TINY at 256px (16x16 = 256 stage-2 tokens/img,
    the flagship's MoE stage layout) — an EP=2 sharded train step must
    reproduce the unsharded step's loss AND updated params. Stronger
    than the 64px-atto dryrun: the expert einsum actually spans devices
    at real token counts, with noisy cosine gating under a fixed rng."""
    import optax

    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE

    model = ConvNeXtMoE(arch="tiny",
                        moe_block_inds=((), (), (0, 2, 4), (0,)),
                        num_experts=4, top_k=2, gate="cosine",
                        noisy_gating=True, capacity_factor=1.5)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "moe_noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 64, 64, 3)), train=True)["params"]
    opt = optax.adamw(1e-3)

    def loss_fn(p, xb):
        outs, gate_loss = model.apply(
            {"params": p}, xb, train=True,
            rngs={"moe_noise": jax.random.PRNGKey(7)})
        main = sum(jnp.mean(o.astype(jnp.float32) ** 2) for o in outs)
        return main + 0.01 * gate_loss

    def train_step(p, xb):
        loss, g = jax.value_and_grad(loss_fn)(p, xb)
        updates, _ = opt.update(g, opt.init(p), p)
        return loss, optax.apply_updates(p, updates)

    ref_loss, ref_params = jax.jit(train_step)(params, x)
    ref_loss = float(ref_loss)

    mesh = make_mesh(2, expert_parallel=2)
    p_sh = jax.device_put(params, param_sharding(mesh, params))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    # expert-sharded leaves must actually split over the 2 devices
    ex = [v for path, v in
          jax.tree_util.tree_flatten_with_path(p_sh)[0]
          if any("experts" in str(getattr(p, "key", "")) for p in path)
          and v.ndim >= 2]
    assert ex and all(len(l.addressable_shards) == 2 for l in ex)

    sh_loss, sh_params = jax.jit(train_step)(p_sh, x_sh)
    sh_loss = float(sh_loss)
    np.testing.assert_allclose(sh_loss, ref_loss, rtol=1e-4)

    ref_leaves = jax.tree.leaves(jax.device_get(ref_params))
    sh_leaves = jax.tree.leaves(jax.device_get(sh_params))
    diffs = [np.abs(a - b) for a, b in zip(ref_leaves, sh_leaves)]
    worst = max(float(d.max()) for d in diffs)
    mean = float(np.mean(np.concatenate([d.ravel() for d in diffs])))
    assert worst < 2e-3, worst     # Adam sign-flip bound, see DP test
    assert mean < 1e-5, mean


@pytest.mark.slow
def test_ep4_flagship_moe_step_equals_single_device():
    """EP=4 equality at the FLAGSHIP MoE topology (VERDICT r4 item 3b):
    8 experts / top-3 cosine gating (SM3Det_convnext_t.py e8k3), experts
    sharded 4-way on a dp=2 x ep=4 mesh — the sharded train step must
    reproduce the unsharded step's loss AND updated params."""
    import optax

    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE

    model = ConvNeXtMoE(arch="atto",
                        moe_block_inds=((), (), (0, 2), (0,)),
                        num_experts=8, top_k=3, gate="cosine",
                        noisy_gating=True, capacity_factor=1.5)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "moe_noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 64, 64, 3)), train=True)["params"]
    opt = optax.adamw(1e-3)

    def loss_fn(p, xb):
        outs, gate_loss = model.apply(
            {"params": p}, xb, train=True,
            rngs={"moe_noise": jax.random.PRNGKey(7)})
        main = sum(jnp.mean(o.astype(jnp.float32) ** 2) for o in outs)
        return main + 0.01 * gate_loss

    def train_step(p, xb):
        loss, g = jax.value_and_grad(loss_fn)(p, xb)
        updates, _ = opt.update(g, opt.init(p), p)
        return loss, optax.apply_updates(p, updates)

    ref_loss, ref_params = jax.jit(train_step)(params, x)
    ref_loss = float(ref_loss)

    mesh = make_mesh(8, expert_parallel=4)
    p_sh = jax.device_put(params, param_sharding(mesh, params))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    # expert-sharded leaves must split 4-way over the expert axis
    # (x2 data replicas = 8 addressable shards)
    ex = [v for path, v in
          jax.tree_util.tree_flatten_with_path(p_sh)[0]
          if any("experts" in str(getattr(p, "key", "")) for p in path)
          and v.ndim >= 2]
    assert ex and all(len(l.addressable_shards) == 8 for l in ex)
    assert all(l.sharding.shard_shape(l.shape)[0] == 2 for l in ex), \
        "expert axis (8) must split 4-way -> 2 experts per shard"

    sh_loss, sh_params = jax.jit(train_step)(p_sh, x_sh)
    sh_loss = float(sh_loss)
    np.testing.assert_allclose(sh_loss, ref_loss, rtol=1e-4)

    ref_leaves = jax.tree.leaves(jax.device_get(ref_params))
    sh_leaves = jax.tree.leaves(jax.device_get(sh_params))
    diffs = [np.abs(a - b) for a, b in zip(ref_leaves, sh_leaves)]
    worst = max(float(d.max()) for d in diffs)
    mean = float(np.mean(np.concatenate([d.ravel() for d in diffs])))
    assert worst < 2e-3, worst     # Adam sign-flip bound, see DP test
    assert mean < 1e-5, mean


@pytest.mark.slow
def test_zero1_optimizer_state_sharding_step_equality():
    """ZeRO-1 analog (SURVEY §2.5): AdamW moments sharded over the
    'data' axis must (a) actually split across devices and (b) leave
    the training step numerically unchanged vs the replicated layout."""
    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE
    from sm3det_tpu.parallel.mesh import zero1_opt_sharding
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import TrainState

    model = ConvNeXtMoE(arch="atto", moe_block_inds=((), (), (0,), ()),
                        num_experts=4, top_k=2, gate="cosine",
                        noisy_gating=True, capacity_factor=1.5)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(4, 128, 128, 3).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "moe_noise": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 64, 64, 3)), train=True)["params"]
    init_fn, update_fn, _ = make_optimizer(base_lr=1e-3, warmup_iters=0,
                                           step_iters=())
    opt0 = init_fn(params)

    def loss_fn(p, xb):
        outs, gate_loss = model.apply(
            {"params": p}, xb, train=True,
            rngs={"moe_noise": jax.random.PRNGKey(7)})
        return sum(jnp.mean(o.astype(jnp.float32) ** 2)
                   for o in outs) + 0.01 * gate_loss

    def train_step(p, opt, xb):
        loss, g = jax.value_and_grad(loss_fn)(p, xb)
        updates, opt = update_fn(g, opt, p, None)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return loss, p, opt

    ref_loss, ref_p, ref_opt = jax.jit(train_step)(params, opt0, x)
    ref_loss = float(ref_loss)

    mesh = make_mesh(4, expert_parallel=2)
    p_sh = param_sharding(mesh, params)
    o_sh = zero1_opt_sharding(mesh, opt0, min_size=2 ** 8)
    x_sh = NamedSharding(mesh, P("data"))
    p_dev = jax.device_put(params, p_sh)
    o_dev = jax.device_put(opt0, o_sh)
    x_dev = jax.device_put(x, x_sh)

    # (a) big moment leaves split over 'data' (2-way here, x2 expert
    # where stacked)
    sharded_leaves = [
        l for l in jax.tree.leaves(o_dev)
        if hasattr(l, "sharding") and l.ndim >= 1
        and l.size >= 2 ** 8
        and any(s is not None
                for s in l.sharding.spec)]
    assert sharded_leaves, "no optimizer-state leaf actually sharded"
    assert any("data" in tuple(str(s) for s in l.sharding.spec)
               for l in sharded_leaves), \
        "no moment leaf sharded over the data axis"
    # every sharded leaf: per-device shard strictly smaller than global
    for l in sharded_leaves:
        assert np.prod(l.sharding.shard_shape(l.shape)) < l.size

    jstep = jax.jit(train_step,
                    in_shardings=(p_sh, o_sh, x_sh),
                    out_shardings=(NamedSharding(mesh, P()), p_sh, o_sh))
    sh_loss, sh_p, sh_opt = jstep(p_dev, o_dev, x_dev)
    np.testing.assert_allclose(float(sh_loss), ref_loss, rtol=1e-4)
    # Adam sign-flip bound (see DP test above): sharded reduction order
    # perturbs near-zero grads; no weight may move apart by > 2*lr and
    # the aggregate drift must be tiny
    for ref_t, sh_t in ((ref_p, sh_p), (ref_opt, sh_opt)):
        ref_leaves = [a for a in jax.tree.leaves(jax.device_get(ref_t))
                      if hasattr(a, "dtype")
                      and np.issubdtype(a.dtype, np.floating)]
        sh_leaves = [a for a in jax.tree.leaves(jax.device_get(sh_t))
                     if hasattr(a, "dtype")
                     and np.issubdtype(a.dtype, np.floating)]
        diffs = [np.abs(a - b) for a, b in zip(ref_leaves, sh_leaves)
                 if a.size]
        worst = max(float(d.max()) for d in diffs)
        mean = float(np.mean(np.concatenate(
            [d.ravel() for d in diffs])))
        assert worst < 2e-3, worst
        assert mean < 1e-5, mean


def test_sync_batchnorm_cross_device_stats():
    """SyncBatchNorm (reference sync_bn op): under a 2-device 'data'
    mesh the normalization must use GLOBAL batch statistics — output
    equals single-device BN over the full batch, not per-shard BN."""
    from flax import linen as fnn
    from jax.experimental.shard_map import shard_map

    from sm3det_tpu.models.layers import SyncBatchNorm

    rng = np.random.RandomState(0)
    # two halves with very different statistics
    x = np.concatenate([
        rng.rand(2, 4, 4, 8).astype(np.float32),
        rng.rand(2, 4, 4, 8).astype(np.float32) * 10 + 5])
    mdl = SyncBatchNorm(axis_name="data")
    variables = mdl.init(jax.random.PRNGKey(0),
                         jnp.asarray(x), use_running_average=False)

    # single-device reference: plain BatchNorm over the full batch
    ref_mdl = fnn.BatchNorm(use_running_average=False)
    ref_vars = ref_mdl.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref, _ = ref_mdl.apply(ref_vars, jnp.asarray(x),
                           mutable=["batch_stats"])

    mesh = make_mesh(2, expert_parallel=1)

    def fwd(v, xb):
        out, _ = mdl.apply(v, xb, use_running_average=False,
                           mutable=["batch_stats"])
        return out

    sharded = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=P("data"))
    got = np.asarray(sharded(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4,
                               atol=2e-4)
