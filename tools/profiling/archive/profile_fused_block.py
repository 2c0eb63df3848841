#!/usr/bin/env python
"""TPU validation + device-true timing of the fused ConvNeXt block
kernels vs the unfused XLA path (tools/ptime.py methodology)."""
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

from sm3det_tpu.models.backbones.convnext import (  # noqa: E402
    _dense, _dwconv7, layernorm_math)
from sm3det_tpu.models.layers import gelu as policy_gelu  # noqa: E402
from sm3det_tpu.ops.pallas.convnext_block_kernel import (  # noqa: E402
    fused_convnext_block, fused_dwconv_ln, fused_layernorm)


def log(m):
    print(m, flush=True)


def mk_params(rng, dim, dtype):
    p = {
        "dwk": rng.randn(7, 7, 1, dim) * 0.05,
        "dwb": rng.randn(dim) * 0.02,
        "lns": rng.rand(dim) + 0.5,
        "lnb": rng.randn(dim) * 0.02,
        "w1": rng.randn(dim, 4 * dim) * 0.05,
        "b1": rng.randn(4 * dim) * 0.02,
        "w2": rng.randn(4 * dim, dim) * 0.05,
        "b2": rng.randn(dim) * 0.02,
        "gamma": rng.rand(dim) * 0.5 + 0.5,
    }
    return {k: jnp.asarray(v.astype(np.float32)).astype(dtype)
            for k, v in p.items()}


def unfused_block(x, p):
    y = _dwconv7(x, p["dwk"], p["dwb"])
    y = layernorm_math(y, p["lns"], p["lnb"])
    y = _dense(y, p["w1"], p["b1"])
    y = policy_gelu(y)
    y = _dense(y, p["w2"], p["b2"])
    return x + y * p["gamma"]


def main():
    rng = np.random.RandomState(0)
    for shape in ((2, 200, 200, 96), (2, 100, 100, 192),
                  (2, 50, 50, 384)):
        dim = shape[-1]
        for dtype, tol in ((jnp.bfloat16, 5e-2),):
            x = jnp.asarray(rng.randn(*shape).astype(np.float32)
                            ).astype(dtype)
            p = mk_params(rng, dim, dtype)
            ref = np.asarray(jax.jit(unfused_block)(x, p), np.float32)
            got = np.asarray(fused_convnext_block(
                x, p["dwk"], p["dwb"], p["lns"], p["lnb"], p["w1"],
                p["b1"], p["w2"], p["b2"], p["gamma"]), np.float32)
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            status = "OK " if rel < tol else "FAIL"
            log(f"{status} block {shape} {dtype.__name__}: rel={rel:.2e}")

        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(
            jnp.bfloat16)
        p = mk_params(rng, dim, jnp.bfloat16)

        def fused(xx, pp):
            return fused_convnext_block(
                xx, pp["dwk"], pp["dwb"], pp["lns"], pp["lnb"],
                pp["w1"], pp["b1"], pp["w2"], pp["b2"], pp["gamma"])

        t_un = device_time(lambda xx: unfused_block(xx, p), (x,),
                           iters=16)
        t_fu = device_time(lambda xx: fused(xx, p), (x,), iters=16)
        log(f"    unfused {t_un:7.3f} ms | fused {t_fu:7.3f} ms "
            f"({t_un / max(t_fu, 1e-9):.2f}x)")

        def prefix_un(xx):
            return layernorm_math(_dwconv7(xx, p["dwk"], p["dwb"]),
                                  p["lns"], p["lnb"])

        t_un = device_time(prefix_un, (x,), iters=16)
        t_fu = device_time(
            lambda xx: fused_dwconv_ln(xx, p["dwk"], p["dwb"],
                                       p["lns"], p["lnb"]),
            (x,), iters=16)
        log(f"    dw+LN unfused {t_un:7.3f} | fused {t_fu:7.3f} "
            f"({t_un / max(t_fu, 1e-9):.2f}x)")

        t_un = device_time(
            lambda xx: layernorm_math(xx, p["lns"], p["lnb"]), (x,),
            iters=16)
        t_fu = device_time(
            lambda xx: fused_layernorm(xx, p["lns"], p["lnb"]), (x,),
            iters=16)
        log(f"    LN    unfused {t_un:7.3f} | fused {t_fu:7.3f} "
            f"({t_un / max(t_fu, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
