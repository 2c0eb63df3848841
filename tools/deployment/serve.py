#!/usr/bin/env python
"""Minimal inference server (parity with the reference's TorchServe
packaging, ``tools/deployment/mmrotate2torchserve.py`` +
``mmrotate_handler.py``): loads a checkpoint, jits the per-modality
inference graphs once, and serves JSON detections over HTTP.

POST /predict  {"subdataset": "rgb", "image": <base64 png/jpg>}
-> {"detections": [{"bbox": [cx,cy,w,h,theta], "score": s, "label": l}]}
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("SM3DET_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def build_server(cfg_path, ckpt_path, port):
    import jax
    import numpy as np
    from sm3det_tpu.utils.config import Config
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.train_state import init_trisource
    from sm3det_tpu.data.loader import PipelineCfg, run_pipeline

    cfg = Config.fromfile(cfg_path)
    model_cfg = cfg.model.to_dict()
    model_cfg.pop("type", None)
    model_cfg["backbone"].pop("pretrained", None)
    model_cfg["backbone"]["moe_block_inds"] = tuple(
        tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    model = TriSourceDetector(cfg=model_cfg)

    g = 8
    s = cfg.img_size
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
    if ckpt_path:
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(ckpt_path))
        params = restored.get("params", restored)
    variables = {"params": params}
    pipe = PipelineCfg(img_size=s, version=cfg.angle_version)

    fns = {}
    for sub, method in (("sar", "simple_test_sar"),
                        ("rgb", "simple_test_rgb"),
                        ("ifr", "simple_test_ifr")):
        fns[sub] = jax.jit(lambda v, x, m=method: model.apply(
            v, x, (s, s), method=m))

    def predict(sub, image_bytes):
        from PIL import Image
        pil = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        arr = np.asarray(pil)[..., ::-1]           # BGR like the pipeline
        sample = run_pipeline(np.random.RandomState(0),
                              dict(img=arr,
                                   obbs=np.zeros((0, 5), np.float32),
                                   labels=np.zeros((0,), np.int32)),
                              pipe, train=False)
        dets, labels, valid = jax.device_get(
            fns[sub](variables, sample["img"][None]))
        dets, labels, valid = dets[0], labels[0], valid[0]
        out = []
        for d, l, v in zip(dets, labels, valid):
            if not v:
                continue
            out.append({"bbox": [float(x) for x in d[:-1]],
                        "score": float(d[-1]), "label": int(l)})
        return out

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            length = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(length))
            sub = req.get("subdataset", "rgb")
            img_b = base64.b64decode(req["image"])
            dets = predict(sub, img_b)
            body = json.dumps({"detections": dets}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/ping":
                self.send_response(200)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_error(404)

    return HTTPServer(("127.0.0.1", port), Handler)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()
    server = build_server(args.config, args.checkpoint, args.port)
    print(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
