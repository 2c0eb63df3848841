"""Pallas TPU kernels: fused ConvNeXt block and LayerNorm.

TPU-native fusion of the ConvNeXt block
(``mmrotate/models/backbones/convnext_moe.py:295-380``: dw7x7 -> LN ->
fc1 -> GELU -> fc2 -> layer-scale -> residual). XLA runs the unfused
block ~8x above its bandwidth+FLOP roofline at bench shapes
(0.838 ms vs ~0.1 ms for (2, 200, 200, 96); tools/profiling/archive/profile_block_v2.py):
every sub-op does its own HBM round trip and the f32 LayerNorm stats
run as separate multi-pass fusions. These kernels make ONE pass over
the activation:

- ``fused_convnext_block``: the whole dense block. A row-band of the
  (pre-padded) input is DMA'd HBM->VMEM double-buffered with its 3-row
  halo; the 7x7 depthwise conv is 49 shifted multiply-accumulates on
  the VPU in f32; LN stats are computed in-register; the two pointwise
  convs run as ``(rows*W, C) @ (C, 4C) @ (4C, C)`` MXU matmuls with the
  GELU between them; layer-scale + residual close the band, which is
  written back once.
- ``fused_dwconv_ln``: the dw7x7+LN prefix only — the MoE blocks'
  dense part (their FFN is the capacity-bucketed MoE dispatch).
- ``fused_layernorm``: plain trailing-axis LN at HBM bandwidth (one
  read, one write; f32 stats), for the stem/downsample/out norms.

Numerics match the flax path (f32 stats and accumulation, activations
at the compute dtype, tanh-GELU on bf16 per models/layers.py::gelu);
parity is asserted in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7): Mosaic
    implements neither ``erf`` nor ``erfc``."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu(x, approximate: bool):
    if approximate:
        return jax.nn.gelu(x, approximate=True)
    # jax.nn.gelu's exact path lowers to erfc; use the polynomial erf
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf(xf * np.float32(np.sqrt(0.5))))
    return y.astype(x.dtype)


# --------------------------------------------------------------------------
# plain LayerNorm
# --------------------------------------------------------------------------


def _ln_kernel(eps, out_dtype):
    def kernel(x_ref, s_ref, b_ref, o_ref):
        xt = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(xt, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xt * xt, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (xt - mean) * jax.lax.rsqrt(var + eps)
        y = y * s_ref[...].astype(jnp.float32) \
            + b_ref[...].astype(jnp.float32)
        o_ref[...] = y.astype(out_dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layernorm(x, scale, bias, eps: float = 1e-6,
                    interpret: bool = False):
    """LayerNorm over the trailing axis in one HBM pass (f32 stats).

    Output dtype follows flax's promotion rule
    (``flax/linen/normalization.py::_normalize``):
    ``promote(x, scale, bias)``.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    out_dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
    xf = x.reshape(m, c)
    tm = min(1024, m)
    grid = (pl.cdiv(m, tm),)
    out = pl.pallas_call(
        _ln_kernel(eps, out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), out_dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(orig_shape)


# --------------------------------------------------------------------------
# fused ConvNeXt block / dwconv+LN
# --------------------------------------------------------------------------


def _vmem_plan_bytes(rb: int, w: int, c: int, hidden: int) -> int:
    """VMEM footprint of the kernel at row-band ``rb`` (bf16 tiles)."""
    hp, wp = rb + 6, _roundup(w + 6, 8)
    cp = _roundup(c, 128)
    v = 2 * hp * wp * cp * 2              # double-buffered input tiles
    v += rb * w * cp * 4 * 3              # f32 acc/ln temporaries
    if hidden:
        v += rb * w * hidden * 4          # f32 fc1 out
        v += rb * w * hidden * 2          # bf16 gelu out
        v += 2 * cp * hidden * 2          # weights
    return v


_VMEM_LIMIT = 11 * 1024 * 1024


def _pick_rb(h: int, w: int, c: int = 0, hidden: int = 0,
             max_tokens: int = 2048) -> int:
    """Largest row-band height dividing ``h`` with ``rb*w <= max_tokens``
    whose VMEM plan fits (0 if none does): big stages get big bands,
    hidden-heavy stages (stage 2/3 dense MLPs) shrink the band instead
    of falling off the fused path entirely."""
    best = 0
    for rb in range(1, h + 1):
        if h % rb == 0 and rb * w <= max_tokens and \
                (not c or _vmem_plan_bytes(rb, w, c, hidden)
                 < _VMEM_LIMIT):
            best = rb
    return best


def _roundup(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _make_block_kernel(bsz, h, w, c, cp, rb, with_mlp, eps, out_dtype,
                       compute_dtype, approx_gelu):
    """c = real channel count (LN divisor); cp = 128-aligned padded
    channels the buffers are laid out in (pad lanes carry zeros through
    dw/LN/MLP: zero weights keep them zero)."""
    nr = h // rb
    hp = rb + 6
    # sublane dim of the DMA'd tile must be 8-aligned for Mosaic's
    # memref slicing; the extra zero columns are never read
    wp = _roundup(w + 6, 8)
    total = bsz * nr

    def kernel(*refs):
        if with_mlp:
            (xp_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
             w2_ref, b2_ref, gamma_ref, out_ref, tiles, sems) = refs
        else:
            (xp_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref,
             out_ref, tiles, sems) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        t = b * nr + i

        def dma(slot, step):
            bb = step // nr
            ii = step % nr
            return pltpu.make_async_copy(
                xp_ref.at[bb, pl.ds(ii * rb, hp)],
                tiles.at[slot], sems.at[slot])

        @pl.when(t == 0)
        def _():
            dma(0, 0).start()

        @pl.when(t + 1 < total)
        def _():
            dma((t + 1) % 2, t + 1).start()

        dma(t % 2, t).wait()
        xt = tiles[t % 2]                                # (hp, wp, c)

        # 7x7 depthwise conv: 49 shifted multiply-accumulates, f32 acc
        acc = jnp.broadcast_to(
            dwb_ref[...].astype(jnp.float32), (rb, w, cp))
        for dy in range(7):
            for dx in range(7):
                tap = xt[dy:dy + rb, dx:dx + w, :].astype(jnp.float32)
                acc = acc + tap * dwk_ref[0, dy * 7 + dx, :].astype(
                    jnp.float32)

        # LayerNorm over channels: f32 stats with the REAL channel
        # count as divisor (pad lanes hold zeros, contributing nothing
        # to the sums; (0-mean)*0*scale+0 keeps them zero after)
        mean = jnp.sum(acc, axis=-1, keepdims=True) * (1.0 / c)
        var = jnp.maximum(
            jnp.sum(acc * acc, axis=-1, keepdims=True) * (1.0 / c)
            - mean * mean, 0.0)
        yn = (acc - mean) * jax.lax.rsqrt(var + eps)
        yn = yn * lns_ref[...].astype(jnp.float32) \
            + lnb_ref[...].astype(jnp.float32)

        if not with_mlp:
            out_ref[0] = yn[:, :, :c].astype(out_dtype) if cp != c \
                else yn.astype(out_dtype)
            return

        tok = yn.astype(compute_dtype).reshape(rb * w, cp)
        h1 = jnp.dot(tok, w1_ref[...],
                     preferred_element_type=jnp.float32) + b1_ref[...]
        h1 = _gelu(h1.astype(compute_dtype), approx_gelu)
        y2 = jnp.dot(h1, w2_ref[...],
                     preferred_element_type=jnp.float32) + b2_ref[...]
        y2 = y2.reshape(rb, w, cp) * gamma_ref[...].astype(jnp.float32)
        shortcut = xt[3:3 + rb, 3:3 + w, :].astype(jnp.float32)
        y2 = (shortcut + y2).astype(out_dtype)
        out_ref[0] = y2[:, :, :c] if cp != c else y2

    return kernel


def _fused_block_impl(x, dwk, dwb, lns, lnb, mlp, eps, interpret):
    """Shared driver: pads x, builds the grid, runs the kernel.

    x: (B, H, W, C) NHWC. mlp: None or (w1, b1, w2, b2, gamma).
    """
    bsz, h, w, c = x.shape
    with_mlp = mlp is not None
    if with_mlp:
        w1, b1, w2, b2, gamma = mlp
        out_dtype = jnp.result_type(x.dtype, w2.dtype, gamma.dtype)
    else:
        out_dtype = jnp.result_type(x.dtype, lns.dtype, lnb.dtype)
    compute_dtype = x.dtype
    approx_gelu = compute_dtype == jnp.bfloat16

    rb = _pick_rb(h, w, c, w1.shape[1] if with_mlp else 0)
    nr = h // rb
    hp, wp = rb + 6, _roundup(w + 6, 8)
    # DMA minor dim must be 128-aligned: run the whole pipeline at
    # padded channels (zero weights keep pad lanes zero; see kernel)
    cp = _roundup(c, 128)
    cpad = ((0, cp - c),)

    xp = jnp.pad(x, ((0, 0), (3, 3), (3, wp - w - 3), (0, cp - c)))
    # (7, 7, 1, C) -> (1, 49, Cp): lane-major taps, loaded once
    dwk_flat = jnp.pad(dwk.reshape(49, c), ((0, 0),) + cpad) \
        .reshape(1, 49, cp)

    def vec(p):
        return jnp.pad(p.astype(jnp.float32), cpad).reshape(1, 1, cp)

    kernel = _make_block_kernel(bsz, h, w, c, cp, rb, with_mlp, eps,
                                out_dtype, compute_dtype, approx_gelu)

    def _const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),           # xp (manual DMA)
        _const_spec((1, 49, cp)),                    # dw kernel
        _const_spec((1, 1, cp)),                     # dw bias
        _const_spec((1, 1, cp)),                     # ln scale
        _const_spec((1, 1, cp)),                     # ln bias
    ]
    args = [xp, dwk_flat, vec(dwb), vec(lns), vec(lnb)]
    if with_mlp:
        hidden = w1.shape[1]
        in_specs += [
            _const_spec((cp, hidden)),               # w1
            _const_spec((1, hidden)),                # b1
            _const_spec((hidden, cp)),               # w2
            _const_spec((1, cp)),                    # b2
            _const_spec((1, 1, cp)),                 # gamma
        ]
        args += [jnp.pad(w1, (cpad[0], (0, 0))).astype(compute_dtype),
                 b1.reshape(1, hidden).astype(jnp.float32),
                 jnp.pad(w2, ((0, 0), cpad[0])).astype(compute_dtype),
                 jnp.pad(b2.astype(jnp.float32), cpad).reshape(1, cp),
                 vec(gamma)]

    out = pl.pallas_call(
        kernel,
        grid=(bsz, nr),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rb, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, hp, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_convnext_block(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma,
                         eps: float = 1e-6, interpret: bool = False):
    """Whole dense ConvNeXt block in one pass:
    ``x + gamma * fc2(gelu(fc1(LN(dw7x7(x)))))``."""
    return _fused_block_impl(x, dwk, dwb, lns, lnb,
                             (w1, b1, w2, b2, gamma), eps, interpret)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_dwconv_ln(x, dwk, dwb, lns, lnb, eps: float = 1e-6,
                    interpret: bool = False):
    """``LN(dw7x7(x))`` — the dense prefix of a MoE ConvNeXt block."""
    return _fused_block_impl(x, dwk, dwb, lns, lnb, None, eps, interpret)


def _dwconv_ln_math(x, dwk, dwb, lns, lnb, eps, out_dtype):
    """f32-accumulated jnp formulation of ``fused_dwconv_ln``'s math
    (dw7x7 with f32 accumulation, LN with f32 stats) — the reference the
    custom VJP below differentiates."""
    acc = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), dwk.astype(jnp.float32), (1, 1),
        ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]) + dwb.astype(jnp.float32)
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(acc * acc, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * lns.astype(jnp.float32) + lnb.astype(jnp.float32)
    return y.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_dwconv_ln_train(x, dwk, dwb, lns, lnb, eps: float = 1e-6,
                          interpret: bool = False):
    """Trainable ``fused_dwconv_ln``: Pallas forward, hand-rolled VJP.

    The backward recomputes the dw7x7 (cheap, VPU-bound — the LN-stats
    residuals fall out of it for free) and differentiates the f32 jnp
    formulation, so no big LN/conv intermediates are saved and no
    Pallas backward kernel is needed. Grad-parity vs the unfused path
    is asserted in tests/test_pallas_kernels.py."""
    return fused_dwconv_ln(x, dwk, dwb, lns, lnb, eps, interpret)


def _fdl_fwd(x, dwk, dwb, lns, lnb, eps, interpret):
    out = fused_dwconv_ln(x, dwk, dwb, lns, lnb, eps, interpret)
    return out, (x, dwk, dwb, lns, lnb)


def _fdl_bwd(eps, interpret, res, g):
    x, dwk, dwb, lns, lnb = res
    out_dtype = jnp.result_type(x.dtype, lns.dtype, lnb.dtype)
    _, vjp = jax.vjp(
        lambda *a: _dwconv_ln_math(*a, eps, out_dtype),
        x, dwk, dwb, lns, lnb)
    return vjp(g.astype(out_dtype))


fused_dwconv_ln_train.defvjp(_fdl_fwd, _fdl_bwd)


def fused_block_supported(h: int, w: int, c: int,
                          hidden: int = 0) -> bool:
    """Static gate: some row-band fits the VMEM plan AND gives the grid
    enough tokens per step to amortize the fixed step cost (rb*w >= 256
    rules out degenerate one-row bands, e.g. stage-4 whole-block whose
    weights alone eat the budget — XLA's unfused path wins there)."""
    if w > 2048 or c > 1024:
        return False
    rb = _pick_rb(h, w, c, hidden)
    return rb > 0 and rb * w >= 256
