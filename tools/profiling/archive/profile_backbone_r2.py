#!/usr/bin/env python
"""Device-true decomposition of the flagship ConvNeXt-T MoE backbone at
bench shapes (4 imgs, 800^2, bf16, inference): nested stage prefixes so
consecutive deltas give per-stage cost; plus isolated MoE-layer and
fused-block micro timings to locate the next kernel target."""
import os
import sys

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

from ptime import device_time  # noqa: E402


def log(m):
    print(m, flush=True)


def main():
    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE
    from sm3det_tpu.models.detectors.trisource import DEFAULT_MODEL_CFG

    bc = DEFAULT_MODEL_CFG["backbone"]
    bsz = 4
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(bsz, 800, 800, 3).astype(np.float32))
    x = x.astype(jnp.bfloat16)

    model = ConvNeXtMoE(
        arch=bc["arch"], drop_path_rate=0.0,
        moe_block_inds=bc["moe_block_inds"],
        num_experts=bc["num_experts"], top_k=bc["top_k"],
        gate=bc["gate"], capacity_factor=bc["capacity_factor"],
        out_indices=(0, 1, 2, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    log("# params ready")

    def pert(a, eps):
        return (a[0] + eps * jnp.asarray(1e-9, a[0].dtype),) + \
            tuple(a[1:])

    t_full = device_time(
        lambda xx, p: model.apply(p, xx, train=False)[0],
        (x, params), iters=16, perturb=pert)
    log(f"backbone full (4 img)      {t_full:8.2f} ms")

    # per-stage: truncated out_indices re-applies only a prefix — the
    # module runs all stages regardless, so instead time stage-isolated
    # submodules via monkey-level shapes
    from sm3det_tpu.models.backbones.convnext import ConvNeXtBlock as Block

    dims = (96, 192, 384, 768)
    depths = (3, 3, 9, 3)
    hw = (200, 100, 50, 25)
    moe_inds = bc["moe_block_inds"]
    for i, (d, dep, s) in enumerate(zip(dims, depths, hw)):
        xi = jnp.asarray(np.random.RandomState(1)
                        .rand(bsz, s, s, d).astype(np.float32)
                        ).astype(jnp.bfloat16)
        n_moe = len([q for q in moe_inds[i] if q < dep])
        # one dense block
        blk = Block(dim=d, drop_path_rate=0.0)
        vp = blk.init(jax.random.PRNGKey(i), xi, train=False)
        vp = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, vp)
        t_b = device_time(
            lambda xx, v, b=blk: b.apply(v, xx, train=False)[0],
            (xi, vp), iters=16, perturb=pert)
        line = (f"stage{i+1} dense block ({bsz}x{s}x{s}x{d})"
                f"   {t_b:6.3f} ms x {dep - n_moe} dense")
        if n_moe:
            mblk = Block(dim=d, drop_path_rate=0.0,
                         moe=dict(num_experts=bc["num_experts"],
                                  top_k=bc["top_k"], gating=bc["gate"],
                                  capacity_factor=bc["capacity_factor"]))
            vm = mblk.init(jax.random.PRNGKey(i), xi, train=False)
            vm = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, vm)
            t_m = device_time(
                lambda xx, v, b=mblk: b.apply(v, xx, train=False)[0],
                (xi, vm), iters=16, perturb=pert)
            line += f" | moe block {t_m:6.3f} ms x {n_moe}"
        log(line)

    # stem cost
    from flax import linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, xx):
            y = nn.Conv(96, (4, 4), strides=(4, 4), name="c")(xx)
            from sm3det_tpu.models.backbones.convnext import \
                layernorm_math
            s = self.param("s", nn.initializers.ones, (96,))
            b = self.param("b", nn.initializers.zeros, (96,))
            return layernorm_math(y, s, b)

    st = Stem()
    vs = st.init(jax.random.PRNGKey(9), x)
    vs = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, vs)
    t_s = device_time(lambda xx, v: st.apply(v, xx), (x, vs), iters=16,
                      perturb=pert)
    log(f"stem conv4x4+LN            {t_s:8.3f} ms")


if __name__ == "__main__":
    main()
