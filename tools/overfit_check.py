#!/usr/bin/env python
# End-to-end learning check: overfit the TriSource model on one synthetic
# batch; PASS = rotated GTs recovered at IoU>0.5 with correct labels.
# (Validates assigners/samplers/coders/losses/NMS as one system.)
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from sm3det_tpu.models.detectors.trisource import TriSourceDetector
from sm3det_tpu.train.dla import make_dla_config
from sm3det_tpu.train.optim import make_optimizer
from sm3det_tpu.train.train_state import TrainState, build_train_step, init_trisource
from sm3det_tpu.ops.rotated_iou import box_iou_rotated

IMG = 256
CFG = dict(num_classes=4, angle_version="le90",
    backbone=dict(arch="atto", drop_path_rate=0.0,
                  moe_block_inds=[[], [], [0], []], num_experts=2, top_k=2,
                  capacity_factor=2.0, noisy_gating=False),
    neck=dict(in_channels=[40, 80, 160, 320], out_channels=64,
              num_outs=5, extra_level=1),
    sar=dict(strides=[8, 16, 32, 64, 128], reg_max=8,
             nms_pre=100, score_thr=0.3, nms_iou=0.6, max_per_img=20),
    rgb=dict(rpn_strides=[4, 8, 16, 32, 64], rpn_sample=64, rcnn_sample=128,
             rpn_nms_pre=300, rpn_max=300, rpn_nms_iou=0.8,
             rcnn_score_thr=0.3, rcnn_nms_iou=0.1, rcnn_max=20))
rng = np.random.RandomState(0)
g = 4
def boxes4(n):
    cx = rng.uniform(40, IMG-40, (n,g)); cy = rng.uniform(40, IMG-40, (n,g))
    w = rng.uniform(30, 70, (n,g)); h = rng.uniform(30, 70, (n,g))
    return np.stack([cx-w/2, cy-h/2, cx+w/2, cy+h/2], -1).astype(np.float32)
def boxes5(n):
    return np.stack([rng.uniform(45,IMG-45,(n,g)), rng.uniform(45,IMG-45,(n,g)),
        rng.uniform(40,80,(n,g)), rng.uniform(18,30,(n,g)),
        rng.uniform(-1.2,1.2,(n,g))], -1).astype(np.float32)
batch = {
  "sar": {"img": rng.rand(2, IMG, IMG, 3).astype(np.float32),
          "gt_bboxes": boxes4(2), "gt_labels": rng.randint(0,4,(2,g)).astype(np.int32),
          "gt_mask": np.ones((2,g), bool)},
  "rgb": {"img": rng.rand(1, IMG, IMG, 3).astype(np.float32),
          "gt_obbs": boxes5(1), "gt_labels": rng.randint(0,4,(1,g)).astype(np.int32),
          "gt_mask": np.ones((1,g), bool)},
  "ifr": {"img": rng.rand(1, IMG, IMG, 3).astype(np.float32),
          "gt_obbs": boxes5(1), "gt_labels": rng.randint(0,4,(1,g)).astype(np.int32),
          "gt_mask": np.ones((1,g), bool)},
}
model = TriSourceDetector(cfg=CFG)
params = init_trisource(jax.random.PRNGKey(0), model, batch)
dla = make_dla_config(warmup_iters=50)
init_fn, update_fn, _ = make_optimizer(base_lr=5e-4, step_iters=(10**6,), warmup_iters=50, dla_cfg=dla)
state = TrainState(params=params, opt=init_fn(params), rng=jax.random.PRNGKey(1))
step = jax.jit(build_train_step(model, init_fn, update_fn), donate_argnums=(0,))
batch_d = jax.device_put(batch)
t0 = time.perf_counter()
state, m = step(state, batch_d)
print("compile %.0fs loss0=%.3f" % (time.perf_counter()-t0, float(m["loss"])), flush=True)
N = 300
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, batch_d)
    if (i+1) % 100 == 0:
        print("iter %d loss=%.4f sar_cls=%.4f rgb_cls=%.4f rgb_bbox=%.4f" % (
            i+1, float(m["loss"]), float(m["sar_loss_cls"]),
            float(m["rgb_loss_cls"]), float(m["rgb_loss_bbox"])), flush=True)
print("train %.1fs (%.0f ms/step)" % (time.perf_counter()-t0, (time.perf_counter()-t0)/N*1000), flush=True)

# now check detections vs gt
v = {"params": state.params}
dets, labels, valid = jax.device_get(jax.jit(
    lambda v, x: model.apply(v, x, (IMG, IMG), method="simple_test_rgb"))(v, batch["rgb"]["img"]))
d, l, va = dets[0], labels[0], valid[0]
print("rgb dets:", int(va.sum()), flush=True)
gt = batch["rgb"]["gt_obbs"][0]
if va.sum():
    iou = np.asarray(box_iou_rotated(gt, d[va][:, :5].astype(np.float32)))
    best = iou.max(axis=1)
    print("per-GT best IoU:", best.round(3), "labels:", l[va][:len(gt)], "gt labels:", batch["rgb"]["gt_labels"][0], flush=True)
    print("RECOVERED %d/%d GTs at IoU>0.5" % (int((best > 0.5).sum()), len(gt)), flush=True)
sd, sl, sv = jax.device_get(jax.jit(
    lambda v, x: model.apply(v, x, (IMG, IMG), method="simple_test_sar"))(v, batch["sar"]["img"]))
for b in range(2):
    dv = sd[b][sv[b]]
    if len(dv):
        gtb = batch["sar"]["gt_bboxes"][b]
        x1 = np.maximum(gtb[:,None,0], dv[None,:,0]); y1 = np.maximum(gtb[:,None,1], dv[None,:,1])
        x2 = np.minimum(gtb[:,None,2], dv[None,:,2]); y2 = np.minimum(gtb[:,None,3], dv[None,:,3])
        inter = np.clip(x2-x1,0,None)*np.clip(y2-y1,0,None)
        a1 = (gtb[:,2]-gtb[:,0])*(gtb[:,3]-gtb[:,1]); a2 = (dv[:,2]-dv[:,0])*(dv[:,3]-dv[:,1])
        iou = inter/(a1[:,None]+a2[None]-inter)
        print("sar img%d: dets=%d per-GT best IoU %s" % (b, len(dv), iou.max(1).round(3)), flush=True)
    else:
        print("sar img%d: no dets" % b, flush=True)
