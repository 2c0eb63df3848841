"""One-process TPU verification drive (see .claude/skills/verify).

Checks, all jitted on the real chip:
- rotated IoU self-IoU == 1
- rotated NMS vs greedy python reference semantics (suppression count)
- tiny TriSource train step: loss finite, params move, accum variant
- aug_test path (gather-based flip) compiles and runs on TPU
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(m):
    print(f"[verify-tpu] {m}", flush=True)


log(f"backend={jax.default_backend()} devices={jax.devices()}")

# --- 1. rotated IoU self-IoU ---
from sm3det_tpu.ops.rotated_iou import box_iou_rotated  # noqa: E402

boxes = jnp.array([[50., 50., 30., 20., 0.3],
                   [20., 30., 10., 8., -0.7],
                   [70., 70., 25., 25., 1.1]], jnp.float32)
iou = jax.jit(box_iou_rotated)(boxes, boxes)
diag = np.asarray(jnp.diagonal(iou))
assert np.allclose(diag, 1.0, atol=1e-3), diag
log(f"rotated self-IoU ok: {diag}")

# --- 2. rotated NMS suppression ---
from sm3det_tpu.ops.nms import nms_rotated  # noqa: E402

nb = jnp.array([[50., 50., 30., 20., 0.0],
                [51., 50., 30., 20., 0.0],   # near-duplicate
                [200., 200., 20., 20., 0.5]], jnp.float32)
sc = jnp.array([0.9, 0.8, 0.7], jnp.float32)
dets, keep_idx, valid = jax.jit(
    lambda b, s: nms_rotated(b, s, 0.1, 3))(nb, sc)
kept = np.asarray(keep_idx)[np.asarray(valid)]
assert set(kept.tolist()) == {0, 2}, kept
log(f"rotated NMS ok: kept={kept}")

# --- 3. tiny train step (incl. accumulate=2) ---
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_train_step import TINY_CFG, tiny_batch  # noqa: E402
from sm3det_tpu.models.detectors.trisource import TriSourceDetector  # noqa
from sm3det_tpu.train.dla import make_dla_config  # noqa: E402
from sm3det_tpu.train.optim import make_optimizer  # noqa: E402
from sm3det_tpu.train.train_state import (TrainState, build_train_step,
                                          init_trisource)  # noqa: E402

model = TriSourceDetector(cfg=TINY_CFG)
batch = tiny_batch()
t0 = time.time()
params = init_trisource(jax.random.PRNGKey(0), model, batch)
log(f"init done in {time.time() - t0:.1f}s")

for accum in (1, 2):
    init_fn, update_fn, _ = make_optimizer(
        base_lr=1e-3, step_iters=(100,), warmup_iters=2,
        dla_cfg=make_dla_config(warmup_iters=2), accumulate=accum)
    state = TrainState(params=params, opt=init_fn(params),
                       rng=jax.random.PRNGKey(1))
    step = jax.jit(build_train_step(model, init_fn, update_fn))
    t0 = time.time()
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    loss1, loss2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(loss1) and np.isfinite(loss2), (loss1, loss2)
    moved = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(params), jax.tree.leaves(s2.params)))
    assert moved > 0, "params did not move"
    log(f"train step accumulate={accum} ok in {time.time() - t0:.1f}s: "
        f"loss {loss1:.3f} -> {loss2:.3f}, max param delta {moved:.2e}")

# --- 4. aug_test on TPU (gather flip must not crash fusion emitter) ---
v = {"params": params}
d, l, va = jax.jit(lambda v, x: model.apply(
    v, x, "rgb", (64, 64), method="aug_test"))(v, batch["rgb"]["img"])
assert np.isfinite(np.asarray(d)).all()
log(f"aug_test (gather flip) ok on TPU: dets {d.shape}")

log("ALL TPU CHECKS PASSED")
