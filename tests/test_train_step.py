"""End-to-end TriSource train-step tests on tiny shapes (CPU).

The fake-dataset harness of SURVEY.md §4: a tiny in-memory batch exercises
config -> model -> losses -> DLA -> optimizer in ONE jitted program.
(The multi-chip sharding path is covered by tests/test_mesh_sharding.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sm3det_tpu.models.detectors.trisource import TriSourceDetector
from sm3det_tpu.train.dla import make_dla_config
from sm3det_tpu.train.optim import make_optimizer
from sm3det_tpu.train.train_state import (TrainState, build_train_step,
                                          init_trisource)

TINY_CFG = dict(
    num_classes=4,
    angle_version="le90",
    backbone=dict(arch="atto", drop_path_rate=0.0,
                  moe_block_inds=((), (), (0,), ()),
                  num_experts=2, top_k=2, gate="cosine",
                  capacity_factor=2.0),
    neck=dict(in_channels=(40, 80, 160, 320), out_channels=32,
              num_outs=5, extra_level=1, add_extra_convs="on_output"),
    sar=dict(strides=(8, 16, 32, 64, 128), reg_max=8,
             nms_pre=50, score_thr=0.05, nms_iou=0.6, max_per_img=20),
    rgb=dict(rpn_strides=(4, 8, 16, 32, 64),
             rpn_sample=32, rcnn_sample=32,
             rpn_nms_pre=64, rpn_max=64, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=20),
)

IMG = 64


def tiny_batch(n_sar=2, n_rgb=1, n_ifr=1, g=4, seed=0):
    rng = np.random.RandomState(seed)

    def boxes4(n):
        cx = rng.uniform(10, IMG - 10, (n, g))
        cy = rng.uniform(10, IMG - 10, (n, g))
        w = rng.uniform(6, 16, (n, g))
        h = rng.uniform(6, 16, (n, g))
        return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                        -1).astype(np.float32)

    def boxes5(n):
        return np.stack([
            rng.uniform(12, IMG - 12, (n, g)),
            rng.uniform(12, IMG - 12, (n, g)),
            rng.uniform(8, 18, (n, g)),
            rng.uniform(5, 8, (n, g)),
            rng.uniform(-1.2, 1.2, (n, g)),
        ], -1).astype(np.float32)

    def labels(n):
        return rng.randint(0, 4, (n, g)).astype(np.int32)

    mask = np.ones((1, g), bool)
    return {
        "sar": {"img": rng.rand(n_sar, IMG, IMG, 3).astype(np.float32),
                "gt_bboxes": boxes4(n_sar), "gt_labels": labels(n_sar),
                "gt_mask": np.repeat(mask, n_sar, 0)},
        "rgb": {"img": rng.rand(n_rgb, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": boxes5(n_rgb), "gt_labels": labels(n_rgb),
                "gt_mask": np.repeat(mask, n_rgb, 0)},
        "ifr": {"img": rng.rand(n_ifr, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": boxes5(n_ifr), "gt_labels": labels(n_ifr),
                "gt_mask": np.repeat(mask, n_ifr, 0)},
    }


@pytest.fixture(scope="module")
def model_and_state():
    model = TriSourceDetector(cfg=TINY_CFG)
    batch = tiny_batch()
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    dla_cfg = make_dla_config(warmup_iters=2)
    init_fn, update_fn, _ = make_optimizer(
        base_lr=1e-4, step_iters=(100,), warmup_iters=2, dla_cfg=dla_cfg)
    state = TrainState(params=params, opt=init_fn(params),
                       rng=jax.random.PRNGKey(1))
    step = build_train_step(model, init_fn, update_fn)
    return model, state, step, batch


def test_train_step_losses_and_update(model_and_state):
    model, state, step, batch = model_and_state
    jstep = jax.jit(step)
    new_state, metrics = jstep(state, batch)
    expected = {"gate_loss", "sar_loss_cls", "sar_loss_bbox", "sar_loss_dfl",
                "rgb_loss_rpn_cls", "rgb_loss_rpn_bbox", "rgb_loss_cls",
                "rgb_loss_bbox", "ifr_loss_rpn_cls", "ifr_loss_rpn_bbox",
                "ifr_loss_cls", "ifr_loss_bbox", "loss"}
    assert expected <= set(metrics.keys())
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, new_state.params)
    max_diff = max(jax.tree.leaves(diff))
    assert max_diff > 0
    # another step from the new state works (state pytree is stable)
    s2, m2 = jstep(new_state, batch)
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.opt.step) == 2


def test_dla_warmup_then_multipliers(model_and_state):
    """During warmup DLA multipliers are identity; after warmup the EMA has
    been primed and multipliers engage (steps counter drives it)."""
    model, state, step, batch = model_and_state
    jstep = jax.jit(step)
    s = state
    for i in range(3):
        s, m = jstep(s, batch)
    assert int(s.opt.dla.steps) == 3
    assert bool(s.opt.dla.initialized.all())
    # EMA holds finite positive loss values
    assert np.all(np.isfinite(np.asarray(s.opt.dla.ema)))


def test_simple_test_paths(model_and_state):
    model, state, step, batch = model_and_state
    variables = {"params": state.params}

    sar_dets, sar_labels, sar_valid = jax.jit(
        lambda v, x: model.apply(v, x, (IMG, IMG), method="simple_test_sar")
    )(variables, batch["sar"]["img"])
    assert sar_dets.shape == (2, 20, 5)
    assert sar_labels.shape == (2, 20)

    rgb = jax.jit(
        lambda v, x: model.apply(v, x, (IMG, IMG), method="simple_test_rgb")
    )(variables, batch["rgb"]["img"])
    dets, labels, valid = rgb
    assert dets.shape == (1, 20, 6)
    assert np.isfinite(np.asarray(dets)).all()


def test_aug_test_paths(model_and_state):
    model, state, step, batch = model_and_state
    import jax
    v = {"params": state.params}
    d, l, va = jax.jit(lambda v, x: model.apply(
        v, x, "rgb", (IMG, IMG), method="aug_test"))(
        v, batch["rgb"]["img"])
    assert d.shape == (1, 20, 6)
    assert np.isfinite(np.asarray(d)).all()


def test_dwa_reweighting(model_and_state):
    import jax
    import jax.numpy as jnp
    from sm3det_tpu.models.detectors.trisource import REWEIGHT_LOSS_KEYS
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import TrainState, build_train_step
    model, state, _, batch = model_and_state
    init_fn, update_fn, _ = make_optimizer(base_lr=1e-4, step_iters=(99,))
    s = TrainState(params=state.params, opt=init_fn(state.params),
                   rng=jax.random.PRNGKey(3),
                   prev_losses=jnp.zeros(len(REWEIGHT_LOSS_KEYS)))
    step = jax.jit(build_train_step(model, init_fn, update_fn,
                                    multi_tasks_reweight="dwa"))
    s1, m1 = step(s, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m2["loss"]))
    assert bool((np.asarray(s2.prev_losses) > 0).any())


def test_uncertainty_reweighting(model_and_state):
    """multi_tasks_reweight='uncertainty' (trisource_...:349-353): the
    learned mtl_sigma param must exist in the param tree (regression:
    ``self.param`` in a non-compact ``__call__`` silently raised under
    linen, so the path never ran) and must receive gradients."""
    import copy
    _, _, _, batch = model_and_state
    cfg = copy.deepcopy(TINY_CFG)
    cfg["multi_tasks_reweight"] = "uncertainty"
    model = TriSourceDetector(cfg=cfg)
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    assert "mtl_sigma" in params, sorted(params)
    assert params["mtl_sigma"].shape == (len(
        __import__("sm3det_tpu.models.detectors.trisource",
                   fromlist=["REWEIGHT_LOSS_KEYS"]).REWEIGHT_LOSS_KEYS),)
    init_fn, update_fn, _ = make_optimizer(
        base_lr=1e-3, step_iters=(100,), warmup_iters=0)
    st = TrainState(params=params, opt=init_fn(params),
                    rng=jax.random.PRNGKey(5))
    step = jax.jit(build_train_step(model, init_fn, update_fn))
    s1, m1 = step(st, batch)
    assert "reweighted_total_losses" in m1
    assert np.isfinite(float(m1["reweighted_total_losses"]))
    # sigmas move: the reweighted sum is the optimized objective
    d_sigma = float(jnp.abs(s1.params["mtl_sigma"] -
                            st.params["mtl_sigma"]).max())
    assert d_sigma > 0
    # individual task losses are still reported for logging/DLA
    assert np.isfinite(float(m1["sar_loss_cls"]))


def test_bf16_train_step(model_and_state):
    """compute_dtype='bfloat16': forward in bf16, fp32 master params,
    fp32 loss math — losses finite, params update in fp32."""
    import copy
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import (TrainState, build_train_step,
                                              init_trisource)
    model32, state, _, batch = model_and_state
    cfg = copy.deepcopy(TINY_CFG)
    cfg["compute_dtype"] = "bfloat16"
    model = TriSourceDetector(cfg=cfg)
    init_fn, update_fn, _ = make_optimizer(
        base_lr=1e-3, step_iters=(100,), warmup_iters=0)
    st = TrainState(params=state.params, opt=init_fn(state.params),
                    rng=jax.random.PRNGKey(7))
    step = jax.jit(build_train_step(model, init_fn, update_fn))
    new_state, metrics = step(st, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # master params stay fp32 and actually move
    leaves = jax.tree_util.tree_leaves(new_state.params)
    assert all(l.dtype == jnp.float32 for l in leaves
               if l.dtype != jnp.int32)
    delta = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(st.params),
                                leaves))
    assert delta > 0


def test_config_driven_tta_equals_manual_merge(model_and_state):
    """Config-driven aug_test (multi-scale + 3-direction flips) must
    equal a manual per-aug simple_test + map-back + joint-NMS merge
    (reference MultiScaleFlipAug -> aug_test,
    trisource_H1stage_R2stage_detector.py:409 + bbox_flip
    transforms.py:9)."""
    import jax
    from sm3det_tpu.ops.box_convert import norm_angle
    from sm3det_tpu.ops.nms import aug_multiclass_nms_rotated
    model, state, step, batch = model_and_state
    v = {"params": state.params}
    imgs = batch["rgb"]["img"]
    scales = (1.0, 0.5)
    flips = (None, "horizontal", "vertical", "diagonal")

    d_auto, l_auto, v_auto = jax.jit(lambda v, x: model.apply(
        v, x, method="aug_test", subdataset="rgb", img_shape=(IMG, IMG),
        scales=scales, flip_directions=flips))(v, imgs)

    # manual per-aug merge
    all_d, all_l, all_v = [], [], []
    for s in scales:
        hs = ws = int(round(IMG * s))
        im_s = imgs if s == 1.0 else jax.image.resize(
            imgs, (imgs.shape[0], hs, ws, imgs.shape[3]), "bilinear")
        for direction in flips:
            im = np.asarray(im_s)
            if direction in ("horizontal", "diagonal"):
                im = im[:, :, ::-1]
            if direction in ("vertical", "diagonal"):
                im = im[:, ::-1]
            d, lab, val = jax.jit(lambda v, x: model.apply(
                v, x, "rgb", (hs, ws), method="simple_test"))(
                v, jnp.asarray(np.ascontiguousarray(im)))
            d = np.asarray(d).copy()
            if direction in ("horizontal", "diagonal"):
                d[..., 0] = ws - d[..., 0] - 1
            if direction in ("vertical", "diagonal"):
                d[..., 1] = hs - d[..., 1] - 1
            if direction is not None:
                d[..., 4] = np.asarray(
                    norm_angle(jnp.asarray(np.pi - d[..., 4]), "le90"))
            d[..., :4] /= s
            all_d.append(jnp.asarray(d))
            all_l.append(lab)
            all_v.append(val)
    d_man, l_man, v_man = jax.vmap(
        lambda ds, ls, vs: aug_multiclass_nms_rotated(
            ds, ls, vs, 0.1, max_out=ds[0].shape[0], box_dim=5)
    )(tuple(all_d), tuple(all_l), tuple(all_v))

    va, vm = np.asarray(v_auto), np.asarray(v_man)
    np.testing.assert_array_equal(va, vm)
    np.testing.assert_allclose(np.asarray(d_auto)[va],
                               np.asarray(d_man)[vm], rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(l_auto)[va],
                                  np.asarray(l_man)[vm])
