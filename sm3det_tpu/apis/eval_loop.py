"""Streaming batched evaluation shared by ``tools/test.py`` and the
train-time eval path (reference EvalHooks, ``mmrotate/apis/train.py:
100-166``, + the single/multi-gpu test loops in
``mmcv/mmcv/engine/test.py``).

Memory stays O(batch_size): a producer thread reads + preprocesses
images (uint8 end-to-end on host — this machine has one core, so host
work is the eval throughput ceiling), a bounded queue hands batches to
the device, normalization runs in-graph, and device dispatch is
pipelined one batch deep (batch k computes while batch k-1 is fetched
and postprocessed).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def preprocess_uint8(raw: Dict, S: int, mean_bgr: Sequence[float]):
    """Eval host pipeline: keep-ratio resize + mean-pad, staying uint8.

    Pads with mean-valued pixels (BGR layout) so the in-graph
    BGR->RGB permute + normalize maps the pad band to ~0, matching the
    train pipeline's normalize-then-zero-pad order (reference
    Normalize->Pad). Returns (img (S,S,3) uint8, scale) so detections
    can be mapped back to original coords (reference rescale=True)."""
    from ..data import transforms as T
    img = raw["img"]
    h, w = img.shape[:2]
    scale = min(S / h, S / w)
    img, _, _, _ = T.resize(img, (S, S), None, None, keep_ratio=True)
    if img.dtype != np.uint8:
        # bilinear resize promotes to float32; cast back so the host
        # pipeline stays uint8 end-to-end (one jit signature, 4x less
        # host->device traffic)
        img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    if img.shape[:2] != (S, S):
        out = np.empty((S, S) + img.shape[2:], np.uint8)
        out[...] = np.rint(np.asarray(mean_bgr)[::-1]).astype(np.uint8)
        out[:img.shape[0], :img.shape[1]] = img
        img = out
    return np.ascontiguousarray(img), scale


def make_uint8_test_fn(model, method: str, S: int, mean, std,
                       method_kwargs: Optional[Dict] = None):
    """Jitted (variables, x_u8) -> simple_test outputs with in-graph
    normalization: uint8 -> f32, BGR->RGB via gather (a ``::-1`` reverse
    inside big graphs crashes libtpu's fusion emitter), then
    (x - mean) / std — mirrors ``T.normalize(to_rgb=True)``.

    ``method_kwargs`` routes extra keywords into the test method (e.g.
    ``aug_test``'s subdataset/scales/flip_directions for TTA)."""
    mean_d = jnp.asarray(mean, jnp.float32)
    inv_std_d = jnp.asarray(1.0 / np.asarray(std, np.float32))
    chan_perm = jnp.asarray([2, 1, 0])
    kw = dict(method_kwargs or {})

    def _fwd(v, x_u8):
        xf = x_u8.astype(jnp.float32)
        xf = jnp.take(xf, chan_perm, axis=-1)
        xf = (xf - mean_d) * inv_std_d
        return model.apply(v, xf, img_shape=(S, S), method=method, **kw)

    return jax.jit(_fwd)


def annotation_of(raw: Dict, gt_key: str) -> Dict:
    """Eval annotation dict from a raw sample, threading the difficult
    gts through as ignore boxes (``tpfp_default`` semantics,
    reference ``eval_map.py:14-126``)."""
    ann = dict(bboxes=raw[gt_key], labels=raw["labels"])
    if raw.get(gt_key + "_ignore") is not None:
        ann["bboxes_ignore"] = raw[gt_key + "_ignore"]
        ann["labels_ignore"] = raw["labels_ignore"]
    # COCO-protocol extras (areas + crowd regions) when the dataset
    # provides them (CocoDetDataset / SARDet path)
    if raw.get("areas") is not None:
        ann["areas"] = raw["areas"]
    if raw.get(gt_key + "_crowd") is not None:
        ann["bboxes_crowd"] = raw[gt_key + "_crowd"]
        ann["labels_crowd"] = raw["labels_crowd"]
        if raw.get("areas_crowd") is not None:
            ann["areas_crowd"] = raw["areas_crowd"]
    return ann


def stream_eval(test_fn: Callable, variables, ds, S: int,
                mean_bgr, *, num_classes: int, box_dim: int = 5,
                gt_key: str = "obbs", batch_size: int = 8,
                indices: Optional[Sequence[int]] = None,
                num_workers: int = 4,
                progress: Optional[Callable[[int, int], None]] = None
                ) -> Tuple[List, List, List]:
    """Run batched inference over ``ds[indices]`` with O(batch) memory.

    Returns (det_results, annotations, img_ids): per image a per-class
    list of (N, box_dim+1) float32 det arrays in ORIGINAL image
    coordinates, the eval annotation dicts, and the image ids."""
    idxs = list(indices) if indices is not None else list(range(len(ds)))
    n_total = len(idxs)
    det_results: List[List[np.ndarray]] = []
    annotations: List[Dict] = []
    img_ids: List[str] = []
    if n_total == 0:
        return det_results, annotations, img_ids
    bs = max(batch_size, 1)
    bq: "queue.Queue" = queue.Queue(maxsize=2)
    producer_exc: list = []

    def producer():
        # always enqueue the sentinel, even on error — otherwise a data
        # error in this daemon thread would leave the consumer blocked
        # on bq.get() forever; the exception re-raises in the caller
        try:
            with ThreadPoolExecutor(max(num_workers, 1)) as pool:
                for start in range(0, n_total, bs):
                    chunk = idxs[start:start + bs]
                    raws = list(pool.map(ds.get_raw, chunk))
                    pre = list(pool.map(
                        lambda r: preprocess_uint8(r, S, mean_bgr), raws))
                    imgs = np.stack([p[0] for p in pre])
                    if len(chunk) < bs:   # pad tail batch (static shapes)
                        imgs = np.concatenate(
                            [imgs,
                             np.repeat(imgs[-1:], bs - len(chunk), 0)])
                    bq.put((raws, pre, imgs))
        except BaseException as e:          # noqa: BLE001
            producer_exc.append(e)
        finally:
            bq.put(None)

    threading.Thread(target=producer, daemon=True).start()
    done = 0
    ncol = box_dim + 1

    def consume(pending):
        nonlocal done
        raws, pre, fut = pending
        dets_b, labels_b, valid_b = jax.device_get(fut)
        done += len(raws)
        if progress is not None:
            progress(done, n_total)
        for j, (raw, (_, scale)) in enumerate(zip(raws, pre)):
            # compact to valid rows ONCE, then split the small array by
            # class (per-class masks over max_det slots per image was
            # the host postprocess hot spot on this 1-core machine)
            v = np.asarray(valid_b[j])
            dets = np.asarray(dets_b[j])[v, :ncol].astype(
                np.float32, copy=True)
            labels = np.asarray(labels_b[j])[v]
            dets[:, :4] /= scale             # back to original coords
            det_results.append(
                [dets[labels == c] for c in range(num_classes)])
            annotations.append(annotation_of(raw, gt_key))
            img_ids.append(str(raw.get("img_id", len(img_ids))))

    # one-deep dispatch pipeline: batch k computes on device while
    # batch k-1's results are fetched + postprocessed on host
    pending = None
    while True:
        item = bq.get()
        if item is not None:
            raws, pre, imgs = item
            fut = test_fn(variables, imgs)       # async dispatch
        if pending is not None:
            consume(pending)
        if item is None:
            break
        pending = (raws, pre, fut)
    if producer_exc:
        raise producer_exc[0]
    return det_results, annotations, img_ids
