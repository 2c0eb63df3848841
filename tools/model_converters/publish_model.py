#!/usr/bin/env python
"""Strip optimizer state from a checkpoint and add a content-hash suffix
(parity with ``tools/model_converters/publish_model.py``)."""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="orbax checkpoint dir (iter_N)")
    p.add_argument("out_prefix", help="output path prefix")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(args.in_ckpt))
    params = state["params"] if "params" in state else state

    tmp = os.path.abspath(args.out_prefix + "_tmp")
    ckptr.save(tmp, {"params": params}, force=True)
    ckptr.wait_until_finished()

    # hash the checkpoint dir contents
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(tmp)):
        for f in sorted(files):
            with open(os.path.join(root, f), "rb") as fh:
                h.update(fh.read())
    digest = h.hexdigest()[:8]
    out = os.path.abspath(f"{args.out_prefix}-{digest}")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.rename(tmp, out)
    print(f"published: {out}")


if __name__ == "__main__":
    main()
