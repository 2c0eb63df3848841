"""BabelRS config execution test (VERDICT r2 item 9).

Builds the InternViTAdapter TriSource detector FROM
``configs/BabelRS_configs/BabelRS_20kstep.py`` (shrunk to test sizes via
cfg overrides, type/topology preserved), runs one train step with the
config's layer-decay optimizer, and asserts the per-depth LR multipliers
actually differ across ViT blocks (the reference's
``InternViTAdapterLayerDecayOptimizerConstructor``,
mmcv_custom/layer_decay_optimizer_constructor.py:30).
"""

import os

import jax
import numpy as np
import pytest

from sm3det_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "BabelRS_configs", "BabelRS_20kstep.py")

TINY_OVERRIDES = {
    "img_size": 64,
    "num_classes": 4,
    "model.num_classes": 4,
    "model.backbone.embed_dim": 32,
    "model.backbone.depth": 4,
    "model.backbone.num_heads": 2,
    "model.backbone.patch_size": 16,
    "model.backbone.interaction_indexes": [1, 3],
    "model.backbone.adapter_dim": 16,
    "model.backbone.pretrained": None,
    "model.neck.in_channels": [16, 16, 16, 16],
    "model.neck.out_channels": 16,
    "model.sar.nms_pre": 50, "model.sar.max_per_img": 20,
    "model.sar.reg_max": 4,
    "model.rgb.rpn_sample": 16, "model.rgb.rcnn_sample": 16,
    "model.rgb.rpn_nms_pre": 32, "model.rgb.rpn_max": 32,
    "model.rgb.rcnn_max": 20,
    "optimizer.layer_decay.num_layers": 4,
}


def _tiny_batch(g=4, img=64, seed=0):
    rng = np.random.RandomState(seed)

    def boxes5(n):
        return np.stack([
            rng.uniform(12, img - 12, (n, g)),
            rng.uniform(12, img - 12, (n, g)),
            rng.uniform(8, 18, (n, g)),
            rng.uniform(5, 8, (n, g)),
            rng.uniform(-1.2, 1.2, (n, g))], -1).astype(np.float32)

    def boxes4(n):
        cx = rng.uniform(10, img - 10, (n, g))
        cy = rng.uniform(10, img - 10, (n, g))
        w = rng.uniform(6, 16, (n, g))
        h = rng.uniform(6, 16, (n, g))
        return np.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                         cy + h / 2], -1).astype(np.float32)

    def sub(n, obb):
        d = {"img": rng.rand(n, img, img, 3).astype(np.float32),
             "gt_labels": rng.randint(0, 4, (n, g)).astype(np.int32),
             "gt_mask": np.ones((n, g), bool)}
        d["gt_obbs" if obb else "gt_bboxes"] = \
            boxes5(n) if obb else boxes4(n)
        return d

    return {"sar": sub(1, False), "rgb": sub(1, True),
            "ifr": sub(1, True)}


@pytest.fixture(scope="module")
def babelrs_setup():
    from sm3det_tpu.models import normalize_model_cfg
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource

    cfg = Config.fromfile(CFG)
    cfg.merge_from_dict(TINY_OVERRIDES)
    model_cfg = normalize_model_cfg(cfg.model.to_dict())
    assert model_cfg["backbone"]["type"] == "InternViTAdapter"
    model_cfg.pop("type")
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)
    batch = _tiny_batch()
    params = init_trisource(jax.random.PRNGKey(0), model, batch,
                            source_ratio=(1, 1, 1))
    return cfg, model, params, batch


def test_layer_decay_multipliers_differ_across_vit_depths(babelrs_setup):
    from sm3det_tpu.train.extras import layer_decay_scales

    cfg, model, params, _ = babelrs_setup
    ld = cfg.optimizer.layer_decay
    rate, n_layers = float(ld["rate"]), int(ld["num_layers"])
    scales = layer_decay_scales(params, num_layers=n_layers,
                                decay_rate=rate)
    bb = scales["backbone"]
    # stem (depth 0) gets the strongest decay; block i gets rate^(L-1-i)
    stem_scale = float(jax.tree.leaves(bb["stem_single"])[0])
    assert np.isclose(stem_scale, rate ** n_layers)
    block_scales = []
    for i in range(4):
        s = float(jax.tree.leaves(bb[f"block{i}"])[0])
        assert np.isclose(s, rate ** (n_layers - (i + 1))), (i, s)
        block_scales.append(s)
    assert len(set(np.round(block_scales, 9))) == 4, \
        "per-depth multipliers must differ"
    # heads stay at lr x1
    head_scale = float(jax.tree.leaves(scales["sar_bbox_head"])[0])
    assert head_scale == 1.0


def test_babelrs_train_step_runs_with_layer_decay(babelrs_setup):
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import TrainState, build_train_step

    cfg, model, params, batch = babelrs_setup
    ld = cfg.optimizer.layer_decay.to_dict() \
        if hasattr(cfg.optimizer.layer_decay, "to_dict") \
        else dict(cfg.optimizer.layer_decay)
    init_fn, update_fn, _ = make_optimizer(
        base_lr=cfg.optimizer.lr,
        weight_decay=cfg.optimizer.get("weight_decay", 0.0),
        step_iters=tuple(cfg.lr_config.get("step", [])),
        warmup_iters=2, layer_decay=ld)
    state = TrainState(params=params, opt=init_fn(params),
                       rng=jax.random.PRNGKey(1),
                       prev_losses=None, ema=None)
    step = build_train_step(model, init_fn, update_fn,
                            source_ratio=(1, 1, 1))
    new_state, metrics = jax.jit(step)(state, batch)
    host = jax.device_get(metrics)
    assert np.isfinite(host["loss"]), host
    # layer decay really scaled the applied updates: deeper blocks move
    # more than shallow ones relative to their gradients — check the stem
    # moved (decayed but nonzero) and params changed overall
    delta = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                         new_state.params, state.params)
    assert max(jax.tree.leaves(delta)) > 0