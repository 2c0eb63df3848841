#!/usr/bin/env python
"""Eigen-CAM explainability (parity: reference ``tools/cam/`` — vendored
pytorch_grad_cam's EigenCAM driven on detection backbones).

Eigen-CAM (Muhammad & Yeasin 2020, the method the reference's
``tools/cam`` applies to ViTDet): project a chosen feature map onto its
first principal component over channels — no gradients, architecture
agnostic — then upsample and overlay on the input image. Works on any
backbone/neck stage of the TriSource model (incl. InternViT-adapter
configs), one heatmap per requested level.

Usage:
    python tools/cam.py CONFIG [CHECKPOINT] --img path.png \
        --subdataset rgb --source neck --level 0 --out-file cam.png
    # or --synthetic for a fixture image
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def eigen_cam(feat):
    """(H, W, C) feature map -> (H, W) first-principal-component
    projection, ReLU'd and normalized to [0, 1] (pytorch_grad_cam
    ``get_2d_projection`` semantics: SVD of the (HW, C) activation
    matrix, sign-corrected so the projection is mostly positive)."""
    import numpy as np
    h, w, c = feat.shape
    m = feat.reshape(-1, c).astype(np.float64)
    m = m - m.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(m, full_matrices=False)
    proj = m @ vt[0]
    if proj.sum() < 0:          # sign fix (direction is arbitrary)
        proj = -proj
    proj = np.maximum(proj, 0)
    rng = proj.max() - proj.min()
    if rng > 0:
        proj = (proj - proj.min()) / rng
    return proj.reshape(h, w)


def overlay(img_u8, cam01, alpha=0.5):
    """Jet-like colormap overlay without cv2/matplotlib."""
    import numpy as np
    c = np.clip(cam01, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * c - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * c - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * c - 1), 0, 1)
    heat = (np.stack([r, g, b], -1) * 255).astype(np.float32)
    out = (1 - alpha) * img_u8.astype(np.float32) + alpha * heat
    return np.clip(out, 0, 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--img")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--subdataset", default="rgb",
                   choices=["sar", "rgb", "ifr"])
    p.add_argument("--source", default="backbone",
                   choices=["backbone", "neck"],
                   help="take features from the backbone stages or the "
                        "FPN levels")
    p.add_argument("--level", type=int, default=-1,
                   help="stage/level index; -1 = one overlay per level "
                        "tiled side by side")
    p.add_argument("--out-file", default="cam_out.png")
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from sm3det_tpu.data.datasets import SyntheticDetDataset, _imread
    from sm3det_tpu.data.loader import PipelineCfg, run_pipeline
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource
    from sm3det_tpu.utils.config import Config
    from sm3det_tpu.utils.image import imresize, imwrite

    cfg = Config.fromfile(args.config)
    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)

    s = cfg.img_size
    if args.synthetic or not args.img:
        ds = SyntheticDetDataset(n=1, img_size=s, box_type="obb", seed=0)
        img0 = ds.get_raw(0)["img"]
    else:
        img0 = _imread(args.img)
    pipe = PipelineCfg(img_size=s, version=cfg.angle_version)
    sample = run_pipeline(
        np.random.RandomState(0),
        dict(img=img0, obbs=np.zeros((0, 5), np.float32),
             labels=np.zeros((0,), np.int32)), pipe, train=False)
    x = sample["img"][None]
    g = 8
    dummy = {m: {"img": x,
                 ("gt_bboxes" if m == "sar" else "gt_obbs"):
                     np.zeros((1, g, 4 if m == "sar" else 5), np.float32),
                 "gt_labels": np.zeros((1, g), np.int32),
                 "gt_mask": np.ones((1, g), bool)}
             for m in ("sar", "rgb", "ifr")}
    params = init_trisource(jax.random.PRNGKey(0), model, dummy,
                            source_ratio=(1, 1, 1))
    if args.checkpoint:
        from sm3det_tpu.train.checkpoint import load_params
        params = load_params(args.checkpoint, params)

    did = {"sar": 0, "rgb": 1, "ifr": 2}[args.subdataset]

    # direct functional access: backbone (and optionally neck) via the
    # bound module
    def run(v, xx):
        ids = jnp.full((xx.shape[0],), did, jnp.int32)

        def inner(mdl):
            feats, _ = mdl.backbone(mdl._cast_in(xx), train=False,
                                    dataset_ids=ids)
            if args.source == "neck":
                if args.subdataset == "sar":
                    return mdl._neck_sar(list(feats))
                return mdl._neck_rcnn(list(feats))
            return feats

        return model.apply(v, method=lambda mdl: inner(mdl))

    feats = jax.device_get(jax.jit(run)({"params": params}, x))
    levels = range(len(feats)) if args.level < 0 else [args.level]
    disp = (sample["img"] * np.array([58.395, 57.12, 57.375]) +
            np.array([123.675, 116.28, 103.53])).clip(0, 255) \
        .astype(np.uint8)
    tiles = []
    for lv in levels:
        f = np.asarray(feats[lv][0], np.float32)
        cam = eigen_cam(f)
        cam_up = imresize(cam[..., None].astype(np.float32),
                          (disp.shape[1], disp.shape[0]))
        if cam_up.ndim == 3:
            cam_up = cam_up[..., 0]
        tiles.append(overlay(disp, cam_up))
    out = np.concatenate(tiles, axis=1) if len(tiles) > 1 else tiles[0]
    imwrite(out, args.out_file)
    print(f"eigen-CAM ({args.source}, levels {list(levels)}) -> "
          f"{args.out_file}")


if __name__ == "__main__":
    main()
