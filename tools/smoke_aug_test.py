#!/usr/bin/env python
"""TPU smoke for aug_test (original + gather-based horizontal flip,
merged NMS): compiles and runs the flip path inside one jitted graph on
the real chip — the ::-1 reverse op it replaces crashed libtpu's fusion
emitter (CLAUDE.md gotchas), so this must be validated on hardware, not
CPU."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import copy

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMG = 512


def main():
    from sm3det_tpu.models.detectors.trisource import (DEFAULT_MODEL_CFG,
                                                       TriSourceDetector)
    from sm3det_tpu.train.train_state import init_trisource

    cfg = copy.deepcopy(DEFAULT_MODEL_CFG)
    cfg["compute_dtype"] = "bfloat16"
    model = TriSourceDetector(cfg=cfg)
    rng = np.random.RandomState(0)
    g = 8

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
    model_init = TriSourceDetector(cfg=copy.deepcopy(DEFAULT_MODEL_CFG))
    params = init_trisource(jax.random.PRNGKey(0), model_init, batch)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)
    v = {"params": params}

    x1 = jnp.asarray(rng.rand(1, IMG, IMG, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, IMG, IMG, 3).astype(np.float32))
    for sub, x in (("rgb", x1), ("ifr", x1), ("sar", x2)):
        fn = jax.jit(lambda vv, xx, s=sub: model.apply(
            vv, xx, s, (IMG, IMG), method="aug_test"))
        dets, labels, valid = jax.device_get(fn(v, x))
        n = int(np.asarray(valid).sum())
        finite = bool(np.isfinite(np.asarray(dets, np.float32)).all())
        print(f"aug_test[{sub}]: kept={n} finite={finite} "
              f"dets_shape={np.asarray(dets).shape}", flush=True)
        assert finite

    # config-driven TTA: multi-scale + all three flip directions in one
    # jitted graph (vertical/diagonal use the same gather formulation)
    fn = jax.jit(lambda vv, xx: model.apply(
        vv, xx, method="aug_test", subdataset="rgb",
        img_shape=(IMG, IMG), scales=(1.0, 0.5),
        flip_directions=(None, "horizontal", "vertical", "diagonal")))
    dets, labels, valid = jax.device_get(fn(v, x1))
    finite = bool(np.isfinite(np.asarray(dets, np.float32)).all())
    print(f"aug_test[tta 2-scale x 4-dir]: kept="
          f"{int(np.asarray(valid).sum())} finite={finite}", flush=True)
    assert finite
    print("aug_test TPU smoke OK", flush=True)


if __name__ == "__main__":
    main()
