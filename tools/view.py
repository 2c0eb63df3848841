#!/usr/bin/env python
"""Expert-routing visualization (parity with ``tools/view.py``):
renders which expert each grid token selected in every MoE block as a
color map next to the input image. Routing ids are captured through the
flax 'intermediates' collection (MoELayer.sow)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

PALETTE = [
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 190), (0, 128, 128), (230, 190, 255),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="configs/sm3det_convnext_t.py")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--out-dir", default="work_dirs/expert_view")
    args = p.parse_args()

    import jax
    import numpy as np
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

    s = args.img_size
    rng = np.random.RandomState(0)
    g = 4
    img = rng.rand(1, s, s, 3).astype(np.float32)
    batch = {
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
    params = init_trisource(jax.random.PRNGKey(0), model, batch,
                            source_ratio=(1, 1, 1))

    def fwd(v, x):
        return model.apply(v, x, train=False,
                           method=lambda m, xx, **kw: m.backbone(
                               xx, train=False),
                           mutable=["intermediates"])

    (feats, gate_loss), inter = jax.jit(fwd)({"params": params}, img)
    routing = jax.tree_util.tree_flatten_with_path(
        inter["intermediates"])[0]
    os.makedirs(args.out_dir, exist_ok=True)

    try:
        from PIL import Image
    except ImportError:
        Image = None

    count = 0
    for path, ids in routing:
        name = "_".join(str(getattr(p_, "key", p_)) for p_ in path
                        if hasattr(p_, "key"))
        ids = np.asarray(ids)
        if ids.ndim == 3:       # sow adds a tuple dim
            ids = ids[0]
        n_tok = ids.shape[0]
        side = int(np.sqrt(n_tok))
        top1 = ids[:, 0].reshape(side, side)
        rgbmap = np.zeros((side, side, 3), np.uint8)
        for e in range(int(top1.max()) + 1):
            rgbmap[top1 == e] = PALETTE[e % len(PALETTE)]
        out_path = os.path.join(args.out_dir, f"{name}.png")
        if Image is not None:
            Image.fromarray(rgbmap).resize(
                (256, 256), Image.NEAREST).save(out_path)
        else:
            np.save(out_path.replace(".png", ".npy"), top1)
        count += 1
        print(f"{name}: tokens={n_tok} experts used="
              f"{len(np.unique(top1))} -> {out_path}")
    print(f"wrote {count} expert-routing maps to {args.out_dir}")


if __name__ == "__main__":
    main()
