#!/usr/bin/env python
"""Export inference graphs as serialized StableHLO artifacts.

TPU-native analog of the reference's ONNX/TensorRT deployment exporters
(``mmcv/mmcv/onnx``, ``mmcv/mmcv/tensorrt``, ``tools/deployment/``):
``jax.export`` serializes the jitted per-modality inference functions
(model + decode + static NMS, fixed shapes) into portable artifacts that
any XLA runtime can load — no Python/flax needed at serving time.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--out-dir", default="work_dirs/export")
    p.add_argument("--subdatasets", nargs="+",
                   default=["sar", "rgb", "ifr"])
    args = p.parse_args()

    import jax
    import numpy as np
    from jax import export as jexport
    from sm3det_tpu.utils.config import Config
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource

    cfg = Config.fromfile(args.config)
    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)

    s = cfg.img_size
    g = 8
    rng = np.random.RandomState(0)
    img = rng.rand(1, s, s, 3).astype(np.float32)
    dummy = {
        "sar": {"img": img, "gt_bboxes": np.zeros((1, g, 4), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "rgb": {"img": img, "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
        "ifr": {"img": img, "gt_obbs": np.zeros((1, g, 5), np.float32),
                "gt_labels": np.zeros((1, g), np.int32),
                "gt_mask": np.ones((1, g), bool)},
    }
    params = init_trisource(jax.random.PRNGKey(0), model, dummy,
                            source_ratio=(1, 1, 1))
    if args.checkpoint:
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint))
        params = restored.get("params", restored)

    os.makedirs(args.out_dir, exist_ok=True)
    method = {"sar": "simple_test_sar", "rgb": "simple_test_rgb",
              "ifr": "simple_test_ifr"}
    for sub in args.subdatasets:
        fn = jax.jit(lambda x, m=method[sub]: model.apply(
            {"params": params}, x, (s, s), method=m))
        exported = jexport.export(fn)(
            jax.ShapeDtypeStruct((1, s, s, 3), np.float32))
        blob = exported.serialize()
        path = os.path.join(args.out_dir, f"{sub}_infer.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"{sub}: {len(blob) / 1e6:.1f} MB -> {path}")
    print("reload with jax.export.deserialize(blob).call(x)")


if __name__ == "__main__":
    main()
