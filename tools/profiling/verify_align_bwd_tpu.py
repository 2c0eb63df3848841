import time
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), flush=True)
from sm3det_tpu.ops.pallas.roi_align_kernel import (
    roi_align_rotated_pyramid_fused_bwd as bwd)

rng = np.random.RandomState(0)
def mk(nb, sizes, c, n, span):
    feats = [jnp.asarray(rng.rand(nb, h, w, c).astype(np.float32))
             for h, w in sizes]
    rois = np.stack([
        rng.randint(0, nb, n).astype(np.float32),
        rng.uniform(40, span-40, n), rng.uniform(40, span-40, n),
        rng.uniform(16, 180, n), rng.uniform(12, 120, n),
        rng.uniform(-1.4, 1.4, n)], -1).astype(np.float32)
    g = rng.rand(n, 7, 7, c).astype(np.float32)
    return feats, jnp.asarray(rois), jnp.asarray(g)

# exactness: TPU kernel vs interpret mode, small shapes
feats, rois, g = mk(2, [(64,64),(32,32),(16,16),(8,8)], 128, 64, 250)
got = [np.asarray(x) for x in bwd(feats, rois, g)]
ref = [np.asarray(x) for x in bwd(feats, rois, g, interpret=True)]
for a, b in zip(got, ref):
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
print("exactness vs interpret: OK", flush=True)

# adversarial: force many consecutive overlaps (same center boxes)
n = 64
rois_ov = np.stack([
    np.zeros(n, np.float32),
    np.full(n, 120.0, np.float32), np.full(n, 120.0, np.float32),
    rng.uniform(30, 60, n).astype(np.float32),
    rng.uniform(30, 60, n).astype(np.float32),
    rng.uniform(-1.4, 1.4, n).astype(np.float32)], -1)
g2 = jnp.asarray(rng.rand(n, 7, 7, 128).astype(np.float32))
got = [np.asarray(x) for x in bwd(feats, jnp.asarray(rois_ov), g2)]
ref = [np.asarray(x) for x in bwd(feats, jnp.asarray(rois_ov), g2, interpret=True)]
for a, b in zip(got, ref):
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
print("all-overlapping accumulation: OK", flush=True)

# timing at train shapes: nb=4, c=256, n=2048 (batch-8 RCNN load)
feats, rois, g = mk(4, [(200,200),(100,100),(50,50),(25,25)], 256, 2048, 790)
f = jax.jit(lambda fs, r, gg: sum(jnp.sum(x) for x in bwd(fs, r, gg)))
out = float(f(feats, rois, g))  # compile+run
K = 20
t0 = time.perf_counter()
acc = 0.0
for _ in range(K):
    acc += float(f(feats, rois, g))
dt = (time.perf_counter() - t0) / K * 1e3
print(f"bwd n=2048 train shapes: {dt:.2f} ms/call (incl ~30ms dispatch floor)", flush=True)
print("VERIFY_OK", flush=True)
