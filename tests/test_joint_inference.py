"""simple_test_joint must reproduce the per-modality simple_test_*
outputs exactly (same params, same inputs — only the batching and
dispatch structure differ)."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                   TriSourceDetector)
from sm3det_tpu.train.train_state import init_trisource

IMG = 64


@pytest.fixture(scope="module")
def model_and_params():
    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    cfg["backbone"].update(arch="atto",
                           moe_block_inds=((), (), (0,), ()),
                           num_experts=2, top_k=1)
    cfg["neck"].update(in_channels=(40, 80, 160, 320), out_channels=32)
    cfg["sar"].update(nms_pre=50, max_per_img=10)
    cfg["rgb"].update(rpn_nms_pre=50, rpn_max=40, rcnn_max=10)
    model = TriSourceDetector(cfg=cfg)
    rng = np.random.RandomState(0)
    g = 4

    def mk(n):
        return {"img": rng.rand(n, IMG, IMG, 3).astype(np.float32),
                "gt_obbs": np.zeros((n, g, 5), np.float32),
                "gt_bboxes": np.zeros((n, g, 4), np.float32),
                "gt_labels": np.zeros((n, g), np.int32),
                "gt_mask": np.ones((n, g), bool)}

    batch = {"sar": {k: v for k, v in mk(2).items() if k != "gt_obbs"},
             "rgb": {k: v for k, v in mk(1).items()
                     if k != "gt_bboxes"},
             "ifr": {k: v for k, v in mk(1).items()
                     if k != "gt_bboxes"}}
    params = init_trisource(jax.random.PRNGKey(0), model, batch)
    return model, {"params": params}


def test_joint_matches_per_modality(model_and_params):
    model, variables = model_and_params
    rng = np.random.RandomState(1)
    sar = jnp.asarray(rng.rand(2, IMG, IMG, 3).astype(np.float32))
    rgb = jnp.asarray(rng.rand(1, IMG, IMG, 3).astype(np.float32))
    ifr = jnp.asarray(rng.rand(1, IMG, IMG, 3).astype(np.float32))
    shape = (IMG, IMG)

    joint = jax.jit(lambda v, a, b, c: model.apply(
        v, a, b, c, shape, method="simple_test_joint"))(
            variables, sar, rgb, ifr)
    ref_sar = jax.jit(lambda v, a: model.apply(
        v, a, shape, method="simple_test_sar"))(variables, sar)
    ref_rgb = jax.jit(lambda v, a: model.apply(
        v, a, shape, method="simple_test_rgb"))(variables, rgb)
    ref_ifr = jax.jit(lambda v, a: model.apply(
        v, a, shape, method="simple_test_ifr"))(variables, ifr)

    for got, ref, name in zip(joint, (ref_sar, ref_rgb, ref_ifr),
                              ("sar", "rgb", "ifr")):
        for g_arr, r_arr in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(g_arr, np.float32),
                np.asarray(r_arr, np.float32),
                rtol=1e-4, atol=1e-3, err_msg=name)
