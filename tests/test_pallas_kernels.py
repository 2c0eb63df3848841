"""Pallas kernel tests (interpret mode on CPU; the TPU path is exercised
by bench/profiling runs — sums match the jnp oracle exactly)."""

import numpy as np

from sm3det_tpu.ops.pallas.rotated_iou_kernel import box_iou_rotated_pallas
from sm3det_tpu.ops.rotated_iou import box_iou_rotated


def test_pallas_iou_matches_oracle():
    rng = np.random.RandomState(0)
    n, m = 130, 70   # non-multiples of the 128 block
    def rand(k):
        return np.stack([
            rng.uniform(0, 400, k), rng.uniform(0, 400, k),
            rng.uniform(4, 60, k), rng.uniform(4, 60, k),
            rng.uniform(-1.5, 1.5, k)], -1).astype(np.float32)
    b1, b2 = rand(n), rand(m)
    got = np.asarray(box_iou_rotated_pallas(b1, b2, interpret=True))
    ref = np.asarray(box_iou_rotated(b1, b2))
    assert got.shape == (n, m)
    assert np.abs(got - ref).max() < 1e-3


def test_fused_roi_align_matches_exact_path():
    """The fused DMA+MXU align must match the exact gather path when both
    use the fused path's (extent-clamped) level routing."""
    import jax.numpy as jnp

    from sm3det_tpu.ops.pallas.roi_align_kernel import (
        compute_patch_size, roi_align_rotated_pyramid_fused, route_levels)
    from sm3det_tpu.ops.roi_align_rotated import roi_align_rotated_pyramid

    rng = np.random.RandomState(0)
    bsz, c = 2, 64
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.rand(bsz, 256 // s, 256 // s, c)
                         .astype(np.float32)) for s in strides]
    n = 64
    rois = jnp.asarray(np.stack([
        rng.randint(0, bsz, n).astype(np.float32),
        rng.uniform(30, 220, n), rng.uniform(30, 220, n),
        rng.uniform(16, 140, n), rng.uniform(8, 140, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32))

    patch = compute_patch_size([f.shape[1] for f in feats],
                               [f.shape[2] for f in feats])
    lvls = route_levels(rois, patch, strides, 56, len(strides))
    exact = np.asarray(roi_align_rotated_pyramid(feats, rois, lvls, 7))
    fused = np.asarray(roi_align_rotated_pyramid_fused(
        feats, rois, 7, interpret=True))
    rel = np.abs(exact - fused).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 1e-4, rel


def test_fused_roi_align_extent_clamp_only_moves_oversized():
    """Moderate boxes keep the reference's sqrt-area level; only boxes
    whose diagonal overflows the patch move coarser."""
    import jax.numpy as jnp

    from sm3det_tpu.ops.pallas.roi_align_kernel import route_levels

    strides = (4, 8, 16, 32)
    patch = 40   # 800x800 bench sizing
    rois = jnp.asarray(np.array([
        # moderate box: sqrt-area rule wins
        [0, 400, 400, 100, 80, 0.3],
        # ultra-elongated bridge: diag 600 >> (40-3)*4 -> clamped coarser
        [0, 400, 400, 600, 12, 0.0],
    ], np.float32))
    lvls = np.asarray(route_levels(rois, patch, strides, 56, 4))
    assert lvls[0] == 0                      # sqrt(8000)=89 < 112
    assert lvls[1] >= 2                      # extent-clamped upward


def test_blocked_greedy_keep_matches_sequential_above_block():
    """N > block exercises the lax.scan blocked path."""
    from sm3det_tpu.ops.nms import bbox_overlaps, nms

    rng = np.random.RandomState(3)
    n = 700   # > 2 blocks of 256
    boxes = rng.uniform(0, 120, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 50, (n, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + wh], -1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    iou = np.asarray(bbox_overlaps(boxes, boxes))

    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > 0.5
    _, idx, valid = nms(boxes, scores, 0.5, max_out=n)
    got = np.asarray(idx)[np.asarray(valid)].tolist()
    assert got == keep


def test_fused_align_bwd_bf16_policy():
    """Regression: bf16 compute policy + fused align custom VJP. The
    exact inner path promotes bf16 feats to f32, so the cotangent must
    be cast to the INNER output dtype (crashed with 'unexpected JAX
    type ... got bfloat16 but expected float32' before the fix)."""
    import jax.numpy as jnp
    import numpy as np

    from sm3det_tpu.models.roi_heads.oriented_roi_head import \
        _roi_feats_fused_bwd

    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.rand(1, 16 // s, 16 // s, 256)
                    .astype(np.float32)).astype(jnp.bfloat16)
        for s in (1, 2, 4, 8))
    rois = jnp.asarray(np.array(
        [[0, 8.0, 8.0, 6.0, 4.0, 0.3],
         [0, 4.0, 4.0, 3.0, 2.0, -0.2]], np.float32))
    g = jnp.ones((2, 7, 7, 256), jnp.bfloat16)
    gf, groi = _roi_feats_fused_bwd(7, (1, 2, 4, 8), 2, 4, False,
                                    (feats, rois), g)
    assert all(a.dtype == f.dtype for a, f in zip(gf, feats))
    assert all(bool(jnp.isfinite(a.astype(jnp.float32)).all())
               for a in gf)
    assert groi.shape == rois.shape


def test_fused_layernorm_matches_flax():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.ops.pallas.convnext_block_kernel import fused_layernorm

    rng = np.random.RandomState(1)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(2, 13, 17, 96).astype(np.float32)
                        ).astype(dtype) * 3.0
        ln = nn.LayerNorm(epsilon=1e-6)
        v = ln.init(jax.random.PRNGKey(0), x)
        scale = jnp.asarray(rng.rand(96).astype(np.float32)).astype(dtype)
        bias = jnp.asarray(rng.randn(96).astype(np.float32)).astype(dtype)
        v = {"params": {"scale": scale, "bias": bias}}
        ref = np.asarray(ln.apply(v, x), np.float32)
        got = np.asarray(fused_layernorm(x, scale, bias, interpret=True),
                         np.float32)
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        assert np.abs(got - ref).max() < tol, (dtype, np.abs(got - ref).max())


def _flax_block_reference(dim, use_grn=False, ls=1e-6):
    """The pre-refactor ConvNeXt block, spelled with flax modules — the
    numerical oracle for both the restructured module and the fused
    kernel (convnext_moe.py:295-380)."""
    import flax.linen as nn

    from sm3det_tpu.models.layers import gelu as policy_gelu

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            shortcut = x
            x = nn.Conv(dim, (7, 7), padding=3,
                        feature_group_count=dim, name="dwconv")(x)
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
            x = nn.Dense(4 * dim, name="pwconv1")(x)
            x = policy_gelu(x)
            x = nn.Dense(dim, name="pwconv2")(x)
            gamma = self.param("gamma", nn.initializers.constant(ls),
                               (dim,))
            return shortcut + x * gamma
    return Ref()


def test_fused_convnext_block_matches_flax():
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.ops.pallas.convnext_block_kernel import (
        fused_convnext_block, fused_dwconv_ln)

    rng = np.random.RandomState(2)
    dim = 96
    ref = _flax_block_reference(dim)
    x32 = jnp.asarray(rng.randn(2, 16, 16, dim).astype(np.float32))
    v = ref.init(jax.random.PRNGKey(0), x32)
    # non-trivial params
    p = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32))
        * 0.05, v["params"])
    p["norm"]["scale"] = p["norm"]["scale"] + 1.0
    p["gamma"] = jnp.abs(p["gamma"]) + 0.5
    v = {"params": p}

    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 4e-2)):
        x = x32.astype(dtype)
        vc = jax.tree.map(lambda a: a.astype(dtype), v)
        ref_out = np.asarray(ref.apply(vc, x), np.float32)
        pp = vc["params"]
        got = np.asarray(fused_convnext_block(
            x, pp["dwconv"]["kernel"], pp["dwconv"]["bias"],
            pp["norm"]["scale"], pp["norm"]["bias"],
            pp["pwconv1"]["kernel"], pp["pwconv1"]["bias"],
            pp["pwconv2"]["kernel"], pp["pwconv2"]["bias"],
            pp["gamma"], interpret=True), np.float32)
        scale = np.abs(ref_out).max() + 1e-9
        rel = np.abs(got - ref_out).max() / scale
        assert rel < tol, (dtype, rel)

    # dw+LN prefix variant
    import flax.linen as nn

    class Prefix(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(dim, (7, 7), padding=3,
                        feature_group_count=dim, name="dwconv")(x)
            return nn.LayerNorm(epsilon=1e-6, name="norm")(x)

    pref = Prefix()
    vp = {"params": {"dwconv": v["params"]["dwconv"],
                     "norm": v["params"]["norm"]}}
    ref_out = np.asarray(pref.apply(vp, x32), np.float32)
    pp = vp["params"]
    got = np.asarray(fused_dwconv_ln(
        x32, pp["dwconv"]["kernel"], pp["dwconv"]["bias"],
        pp["norm"]["scale"], pp["norm"]["bias"], interpret=True),
        np.float32)
    rel = np.abs(got - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
    assert rel < 1e-5, rel


def test_fused_dwconv_ln_train_grad_parity():
    """The trainable wrapper's custom VJP must match jax.grad of the
    unfused formulation (value AND all five parameter grads)."""
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.ops.pallas.convnext_block_kernel import (
        _dwconv_ln_math, fused_dwconv_ln_train)

    rng = np.random.RandomState(7)
    dim = 96
    x = jnp.asarray(rng.randn(2, 16, 16, dim).astype(np.float32))
    dwk = jnp.asarray(rng.randn(7, 7, 1, dim).astype(np.float32) * 0.05)
    dwb = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.05)
    lns = jnp.asarray(1.0 + rng.randn(dim).astype(np.float32) * 0.05)
    lnb = jnp.asarray(rng.randn(dim).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.randn(2, 16, 16, dim).astype(np.float32))

    def loss_fused(*a):
        return jnp.sum(fused_dwconv_ln_train(*a, 1e-6, True) * g)

    def loss_ref(*a):
        return jnp.sum(_dwconv_ln_math(*a, 1e-6, jnp.float32) * g)

    val_f = float(loss_fused(x, dwk, dwb, lns, lnb))
    val_r = float(loss_ref(x, dwk, dwb, lns, lnb))
    assert abs(val_f - val_r) / (abs(val_r) + 1e-9) < 1e-5

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, dwk, dwb, lns, lnb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, dwk, dwb, lns, lnb)
    for a, b in zip(gf, gr):
        scale = np.abs(np.asarray(b)).max() + 1e-9
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        assert rel < 1e-5, rel


def test_restructured_block_matches_flax_modules():
    """ConvNeXtBlock's param-container refactor (explicit lax ops) must
    be numerically identical to the flax-module formulation, and its
    param tree must keep the same names/shapes (checkpoint contract)."""
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.models.backbones.convnext import ConvNeXtBlock

    rng = np.random.RandomState(3)
    dim = 32
    x = jnp.asarray(rng.randn(2, 8, 8, dim).astype(np.float32))
    blk = ConvNeXtBlock(dim=dim)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    names = {(k, tuple(jax.tree_util.tree_leaves(sub)[0].shape)
              if k == "gamma" else None)
             for k, sub in v["params"].items()}
    assert {k for k, _ in names} == {
        "dwconv", "norm", "pwconv1", "pwconv2", "gamma"}
    assert v["params"]["dwconv"]["kernel"].shape == (7, 7, 1, dim)
    assert v["params"]["pwconv1"]["kernel"].shape == (dim, 4 * dim)

    ref = _flax_block_reference(dim)
    vr = ref.init(jax.random.PRNGKey(0), x)
    # same tree structure -> can swap param sets wholesale
    out_new = np.asarray(blk.apply(vr, x, train=False)[0])
    out_ref = np.asarray(ref.apply(vr, x))
    assert np.abs(out_new - out_ref).max() < 1e-6


def _bucket_fixture(rng, n, img=512, bsz=2, c=64, p_big=0.2):
    """Proposal-like mix: small boxes fit the small patch (diag < 52 px
    -> <= 13 cells at stride 4), `big` boxes need the full patch."""
    import jax.numpy as jnp
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.rand(bsz, img // s, img // s, c)
                         .astype(np.float32)) for s in strides]
    big = rng.rand(n) < p_big          # one mask for BOTH dims so the
    w = np.where(big, rng.uniform(100, 220, n),     # big count is ~p_big*n
                 rng.uniform(8, 36, n))
    h = np.where(big, rng.uniform(100, 220, n), rng.uniform(8, 36, n))
    rois = jnp.asarray(np.stack([
        rng.randint(0, bsz, n).astype(np.float32),
        rng.uniform(30, img - 30, n), rng.uniform(30, img - 30, n),
        w, h, rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32))
    return feats, rois, int(big.sum())


def test_bucketed_align_matches_unbucketed():
    """Size-bucketed fused align == plain fused align when every RoI
    needing the full patch fits in the big bucket (n_big <= big_k)."""
    from sm3det_tpu.ops.pallas.roi_align_kernel import (
        compute_patch_size, roi_align_rotated_pyramid_fused,
        roi_align_rotated_pyramid_fused_bucketed)

    rng = np.random.RandomState(7)
    n = 97   # odd: exercises the group-padding path
    feats, rois, n_big = _bucket_fixture(rng, n)
    # 512 px image -> full patch 24 > small_patch 16: both kernels run
    assert compute_patch_size([f.shape[1] for f in feats],
                              [f.shape[2] for f in feats]) > 16
    assert n_big <= 32 < n

    plain = np.asarray(roi_align_rotated_pyramid_fused(
        feats, rois, 7, interpret=True))
    bucketed = np.asarray(roi_align_rotated_pyramid_fused_bucketed(
        feats, rois, 7, big_k=32, interpret=True))
    rel = np.abs(plain - bucketed).max() / (np.abs(plain).max() + 1e-9)
    assert rel < 1e-5, rel


def test_bucketed_align_overflow_bound():
    """When MORE than big_k RoIs need the full patch, ONLY the overflow
    RoIs (the smallest of the big class) may differ — they sample one
    level coarser (the kernel's documented graceful degradation); every
    other RoI stays exact."""
    from sm3det_tpu.ops.pallas.roi_align_kernel import (
        roi_align_rotated_pyramid_fused,
        roi_align_rotated_pyramid_fused_bucketed)

    rng = np.random.RandomState(11)
    n, big_k = 97, 8
    feats, rois, n_big = _bucket_fixture(rng, n, p_big=0.3)
    assert n_big > big_k   # forces overflow

    plain = np.asarray(roi_align_rotated_pyramid_fused(
        feats, rois, 7, interpret=True))
    bucketed = np.asarray(roi_align_rotated_pyramid_fused_bucketed(
        feats, rois, 7, big_k=big_k, interpret=True))
    diff = np.abs(plain - bucketed).max(axis=(1, 2, 3)) > \
        1e-5 * np.abs(plain).max()
    assert diff.sum() <= n_big - big_k, (diff.sum(), n_big, big_k)


def test_pallas_iou_triu_upper_matches_and_vmap_safe():
    """triu mode: strict-upper blocks equal the full kernel, lower
    blocks are zero; program_id axes must survive an outer vmap (the
    joint path vmaps NMS over images)."""
    import jax

    rng = np.random.RandomState(1)

    def rand(k):
        return np.stack([
            rng.uniform(0, 400, k), rng.uniform(0, 400, k),
            rng.uniform(4, 60, k), rng.uniform(4, 60, k),
            rng.uniform(-1.5, 1.5, k)], -1).astype(np.float32)

    n = 260   # 3 blocks: exercises diag/upper/lower tiles
    b = rand(n)
    full = np.asarray(box_iou_rotated_pallas(b, b, interpret=True))
    tri = np.asarray(box_iou_rotated_pallas(b, b, triu=True,
                                            interpret=True))
    blk = 128
    iu = np.triu_indices(n)
    bi, bj = iu[0] // blk, iu[1] // blk
    upper = bj >= bi
    assert np.abs(tri[iu[0][upper], iu[1][upper]]
                  - full[iu[0][upper], iu[1][upper]]).max() < 1e-6
    # strictly-lower BLOCKS are zeroed
    il = np.tril_indices(n, k=-1)
    low_blocks = (il[1] // blk) < (il[0] // blk)
    assert np.abs(tri[il[0][low_blocks], il[1][low_blocks]]).max() == 0.0

    batched = np.asarray(jax.vmap(
        lambda bb: box_iou_rotated_pallas(bb, bb, triu=True,
                                          interpret=True))(
        np.stack([b, rand(n)])))
    assert np.abs(batched[0] - tri).max() < 1e-6


def test_pallas_hbb_iou_matches_bbox_overlaps():
    import jax

    from sm3det_tpu.ops.nms import bbox_overlaps
    from sm3det_tpu.ops.pallas.hbb_iou_kernel import hbb_iou_pallas

    rng = np.random.RandomState(2)

    def rand(k):
        x1 = rng.uniform(0, 300, k)
        y1 = rng.uniform(0, 300, k)
        return np.stack([x1, y1, x1 + rng.uniform(1, 80, k),
                         y1 + rng.uniform(1, 80, k)], -1).astype(np.float32)

    n, m = 150, 270
    b1, b2 = rand(n), rand(m)
    got = np.asarray(hbb_iou_pallas(b1, b2, interpret=True))
    ref = np.asarray(bbox_overlaps(b1, b2))
    assert got.shape == (n, m)
    assert np.abs(got - ref).max() < 1e-6

    bb = rand(260)
    tri = np.asarray(hbb_iou_pallas(bb, bb, triu=True,
                                    interpret=True))
    full = np.asarray(bbox_overlaps(bb, bb))
    iu = np.triu_indices(260)
    up = (iu[1] // 128) >= (iu[0] // 128)
    assert np.abs(tri[iu[0][up], iu[1][up]]
                  - full[iu[0][up], iu[1][up]]).max() < 1e-6
    batched = np.asarray(jax.vmap(
        lambda b: hbb_iou_pallas(b, b, triu=True, interpret=True))(
        np.stack([bb, rand(260)])))
    assert np.abs(batched[0] - tri).max() < 1e-6


def test_pallas_rotated_iou_banded_groups():
    """Group-banded mode: same-group values match the dense kernel, tiles
    whose row/col group ranges don't overlap (or are entirely inert) are
    exact zeros, and the triu variant composes with banding."""
    from sm3det_tpu.ops.pallas.rotated_iou_kernel import INERT_GROUP
    from sm3det_tpu.ops.rotated_iou import box_iou_rotated_chunked

    rng = np.random.RandomState(7)
    n = 300   # 3 blocks incl. a ragged one
    b = np.stack([
        rng.uniform(0, 512, n), rng.uniform(0, 512, n),
        rng.uniform(8, 64, n), rng.uniform(8, 64, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    groups = np.sort(rng.randint(0, 5, n)).astype(np.int32)
    groups[-9:] = INERT_GROUP   # trailing inert band (NMS-ineligible)

    ref = np.asarray(box_iou_rotated_chunked(b, b))
    same = (groups[:, None] == groups[None, :]) & \
        (groups[:, None] < INERT_GROUP)

    got = np.asarray(box_iou_rotated_pallas(
        b, b, groups1=groups, groups2=groups, interpret=True))
    assert np.abs((got - ref) * same).max() < 1e-4

    # fully-skipped tiles (disjoint group ranges / inert) are exact zeros
    blk = 128
    nb = -(-n // blk)
    gp = np.pad(groups, (0, nb * blk - n),
                constant_values=INERT_GROUP).reshape(nb, blk)
    gmin, gmax = gp.min(1), gp.max(1)
    for i in range(nb):
        for j in range(nb):
            skip = (gmax[i] < gmin[j]) or (gmax[j] < gmin[i]) or \
                gmin[i] >= INERT_GROUP or gmin[j] >= INERT_GROUP
            if skip:
                tile = got[i * blk:(i + 1) * blk, j * blk:(j + 1) * blk]
                assert np.abs(tile).max() == 0.0

    tri = np.asarray(box_iou_rotated_pallas(
        b, b, triu=True, groups1=groups, groups2=groups, interpret=True))
    iu = np.triu_indices(n)
    up = (iu[1] // blk) >= (iu[0] // blk)
    mask = same[iu[0][up], iu[1][up]]
    assert np.abs((tri - ref)[iu[0][up], iu[1][up]] * mask).max() < 1e-4


def test_fused_align_bwd_kernel_matches_jnp_vjp():
    """The Pallas windowed read-modify-write backward must reproduce the
    jnp exact path's VJP (the reference CUDA backward's atomicAdd
    semantics) — overlapping RoI windows exercise the serialized
    scatter-accumulate."""
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.ops.pallas.roi_align_kernel import (
        compute_patch_size, roi_align_rotated_pyramid_fused_bwd,
        route_levels)
    from sm3det_tpu.ops.roi_align_rotated import roi_align_rotated_pyramid

    rng = np.random.RandomState(2)
    bsz, c = 2, 64
    strides = (4, 8, 16, 32)
    feats = tuple(jnp.asarray(rng.rand(bsz, 256 // s, 256 // s, c)
                              .astype(np.float32)) for s in strides)
    n = 48
    rois = jnp.asarray(np.stack([
        rng.randint(0, bsz, n).astype(np.float32),
        rng.uniform(30, 220, n), rng.uniform(30, 220, n),
        rng.uniform(16, 140, n), rng.uniform(8, 140, n),
        rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32))
    g = jnp.asarray(rng.randn(n, 7, 7, c).astype(np.float32))

    patch = compute_patch_size([f.shape[1] for f in feats],
                               [f.shape[2] for f in feats])
    lvls = route_levels(rois, patch, strides, 56, len(strides))
    _, vjp = jax.vjp(
        lambda f: roi_align_rotated_pyramid(list(f), rois, lvls, 7,
                                            featmap_strides=strides),
        feats)
    ref = vjp(g)[0]
    got = roi_align_rotated_pyramid_fused_bwd(
        feats, rois, g, 7, strides, interpret=True)
    for a, b in zip(got, ref):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert rel < 1e-4, rel


def test_fused_align_bwd_all_overlapping_rois():
    """Adversarial case for the conflict-gated double-buffered RMW
    pipeline: every RoI shares one center so EVERY consecutive window
    pair conflicts (conf[i]=1 for all i>0) and the accumulate chain is
    fully serialized. Guards the slot-reuse/conflict-wait logic in
    roi_align_kernel.py (the class of bug the double-buffering could
    silently introduce: a lost or doubled partial accumulation)."""
    import jax
    import jax.numpy as jnp

    from sm3det_tpu.ops.pallas.roi_align_kernel import (
        compute_patch_size, roi_align_rotated_pyramid_fused_bwd,
        route_levels)
    from sm3det_tpu.ops.roi_align_rotated import roi_align_rotated_pyramid

    rng = np.random.RandomState(7)
    bsz, c, n = 2, 64, 40
    strides = (4, 8, 16, 32)
    feats = tuple(jnp.asarray(rng.rand(bsz, 256 // s, 256 // s, c)
                              .astype(np.float32)) for s in strides)
    rois = jnp.asarray(np.stack([
        np.zeros(n, np.float32),
        np.full(n, 120.0, np.float32), np.full(n, 120.0, np.float32),
        rng.uniform(24, 60, n).astype(np.float32),
        rng.uniform(24, 60, n).astype(np.float32),
        rng.uniform(-1.4, 1.4, n).astype(np.float32)], -1))
    g = jnp.asarray(rng.randn(n, 7, 7, c).astype(np.float32))

    patch = compute_patch_size([f.shape[1] for f in feats],
                               [f.shape[2] for f in feats])
    lvls = route_levels(rois, patch, strides, 56, len(strides))
    _, vjp = jax.vjp(
        lambda f: roi_align_rotated_pyramid(list(f), rois, lvls, 7,
                                            featmap_strides=strides),
        feats)
    ref = vjp(g)[0]
    got = roi_align_rotated_pyramid_fused_bwd(
        feats, rois, g, 7, strides, interpret=True)
    for a, b in zip(got, ref):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert rel < 1e-4, rel
