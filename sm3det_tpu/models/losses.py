"""Detection losses (pure jnp), weighted-and-masked for static shapes.

Covers the losses used by the SM3Det configs and the zoo
(SURVEY.md §2.2): Quality Focal / Distribution Focal (GFL), GIoU,
Smooth L1, sigmoid/softmax cross-entropy, sigmoid focal loss
(reference CUDA op ``focal_loss_cuda.cu`` — here plain jnp; XLA fuses it),
plus the Gaussian-distance family (GWD/KLD) and rotated IoU loss used by
other detectors (``mmrotate/models/losses/``).

Every loss takes an elementwise ``weight`` and an ``avg_factor`` so the
caller controls masking/normalization exactly as the reference's
``weighted_loss`` decorator does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.box_convert import obb2poly
from ..ops.rotated_iou import box_iou_rotated


def _reduce(loss, weight=None, avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


# --------------------------------------------------------------------------
# Classification
# --------------------------------------------------------------------------

def sigmoid_cross_entropy(logits, labels, weight=None, avg_factor=None):
    """Binary CE with logits; labels same shape (0/1 float)."""
    loss = jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _reduce(loss, weight, avg_factor)


def softmax_cross_entropy(logits, labels, weight=None, avg_factor=None,
                          num_classes=None):
    """CE with integer labels; labels (N,) int, logits (N, C)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _reduce(nll, weight, avg_factor)


def sigmoid_focal_loss(logits, labels, gamma=2.0, alpha=0.25,
                       weight=None, avg_factor=None):
    """mmcv sigmoid_focal_loss: labels (N,) int in [0, C] where C=bg.

    Matches ``mmcv/mmcv/ops/csrc/.../sigmoid_focal_loss_cuda_kernel.cuh``
    semantics (one-vs-all per class, background = no positive class).
    """
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(onehot > 0, p, 1 - p)
    alpha_t = jnp.where(onehot > 0, alpha, 1 - alpha)
    ce = -jnp.log(jnp.clip(pt, 1e-12))
    loss = alpha_t * ((1 - pt) ** gamma) * ce
    loss = loss.sum(-1)
    return _reduce(loss, weight, avg_factor)


def quality_focal_loss(logits, labels, scores, beta=2.0,
                       weight=None, avg_factor=None):
    """Quality Focal Loss (GFL).

    Args:
        logits: (N, C) class logits (sigmoid).
        labels: (N,) int class index; ``C`` (==num_classes) means background.
        scores: (N,) quality targets (IoU) for positive samples.

    mmdet ``QualityFocalLoss`` behavior: negatives regress all classes to 0
    with weight p^beta; positives regress their class to the IoU score with
    weight |score - p|^beta.
    """
    num_classes = logits.shape[-1]
    p = jax.nn.sigmoid(logits)

    # negatives part: BCE(p, 0) * p^beta for every class
    zerolabel = jnp.zeros_like(logits)
    bce_all = jnp.maximum(logits, 0) - logits * zerolabel + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce_all * (p ** beta)

    pos = labels < num_classes
    pos_label = jnp.where(pos, labels, 0)
    onehot = jax.nn.one_hot(pos_label, num_classes, dtype=logits.dtype)
    score_t = scores[..., None] * onehot
    bce_pos = jnp.maximum(logits, 0) - logits * score_t + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    mod = jnp.abs(score_t - p) ** beta
    pos_loss = bce_pos * mod
    loss = jnp.where((pos[..., None]) & (onehot > 0), pos_loss, loss)
    loss = loss.sum(-1)
    return _reduce(loss, weight, avg_factor)


def distribution_focal_loss(pred, label, weight=None, avg_factor=None):
    """DFL: cross-entropy to the two integer bins bracketing the target.

    Args:
        pred: (N, reg_max+1) distribution logits.
        label: (N,) continuous targets in [0, reg_max].
    """
    dis_left = jnp.floor(label).astype(jnp.int32)
    dis_right = dis_left + 1
    weight_left = dis_right.astype(pred.dtype) - label
    weight_right = label - dis_left.astype(pred.dtype)
    logp = jax.nn.log_softmax(pred, axis=-1)
    n_bins = pred.shape[-1]
    dis_right = jnp.minimum(dis_right, n_bins - 1)
    nll_left = -jnp.take_along_axis(logp, dis_left[..., None], -1)[..., 0]
    nll_right = -jnp.take_along_axis(logp, dis_right[..., None], -1)[..., 0]
    loss = nll_left * weight_left + nll_right * weight_right
    return _reduce(loss, weight, avg_factor)


# --------------------------------------------------------------------------
# Box regression
# --------------------------------------------------------------------------

def smooth_l1_loss(pred, target, beta=1.0, weight=None, avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    return _reduce(loss, weight, avg_factor)


def l1_loss(pred, target, weight=None, avg_factor=None):
    return _reduce(jnp.abs(pred - target), weight, avg_factor)


def giou_loss(pred, target, eps=1e-7, weight=None, avg_factor=None):
    """GIoU loss on xyxy boxes (mmdet semantics)."""
    # areas
    ap = jnp.clip(pred[..., 2] - pred[..., 0], 0) * \
        jnp.clip(pred[..., 3] - pred[..., 1], 0)
    at = jnp.clip(target[..., 2] - target[..., 0], 0) * \
        jnp.clip(target[..., 3] - target[..., 1], 0)
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = ap + at - inter + eps
    iou = inter / union
    # enclosing box
    lt_c = jnp.minimum(pred[..., :2], target[..., :2])
    rb_c = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1] + eps
    giou = iou - (area_c - union) / area_c
    return _reduce(1 - giou, weight, avg_factor)


def rotated_iou_loss(pred, target, mode="log", eps=1e-6,
                     weight=None, avg_factor=None):
    """Differentiable rotated IoU loss (``rotated_iou_loss.py:62``);
    the polygon-clip IoU in :mod:`sm3det_tpu.ops.rotated_iou` is already
    differentiable, replacing the custom CUDA grad."""
    ious = box_iou_rotated(pred, target, aligned=True)
    ious = jnp.clip(ious, eps, 1.0)
    if mode == "linear":
        loss = 1 - ious
    elif mode == "log":
        loss = -jnp.log(ious)
    elif mode == "square":
        loss = 1 - ious ** 2
    else:
        raise ValueError(mode)
    return _reduce(loss, weight, avg_factor)


# --------------------------------------------------------------------------
# Gaussian-distribution losses (GWD / KLD) — mmrotate gaussian_dist_loss.py
# --------------------------------------------------------------------------

def obb2gaussian(obbs):
    """OBB -> (mean (..,2), covariance (..,2,2)).

    ``gaussian_dist_loss.py:11`` ``xy_wh_r_2_xy_sigma``: sigma =
    R diag(w/2, h/2)^2 R^T.
    """
    xy = obbs[..., :2]
    wh = jnp.clip(obbs[..., 2:4], 1e-7, 1e7) * 0.5
    r = obbs[..., 4]
    cos_r, sin_r = jnp.cos(r), jnp.sin(r)
    rmat = jnp.stack([
        jnp.stack([cos_r, -sin_r], -1),
        jnp.stack([sin_r, cos_r], -1),
    ], -2)                                            # (..., 2, 2)
    s = wh[..., None] * jnp.eye(2)                    # diag(w/2, h/2)
    sigma = rmat @ (s * s) @ jnp.swapaxes(rmat, -1, -2)
    return xy, sigma


def _gd_postprocess_v2(distance, fun, tau):
    """``gaussian_dist_loss.py:64 postprocess``: distance -> loss."""
    if fun == "log1p":
        distance = jnp.log1p(distance)
    elif fun == "sqrt":
        distance = jnp.sqrt(jnp.clip(distance, 1e-7))
    elif fun != "none":
        raise ValueError(fun)
    return 1 - 1 / (tau + distance) if tau >= 1.0 else distance


def gwd_loss(pred, target, fun="log1p", tau=1.0, alpha=1.0,
             normalize=True, weight=None, avg_factor=None):
    """Gaussian Wasserstein distance loss (``gaussian_dist_loss.py:92``):
    distance = sqrt(xy_dist + alpha^2 * whr_dist), THEN normalized by
    2 * (det_p * det_t)^(1/8), then postprocessed — the sqrt happens
    before the normalization (oracle-verified ordering)."""
    mu_p, sig_p = obb2gaussian(pred)
    mu_t, sig_t = obb2gaussian(target)
    xy_dist = jnp.sum((mu_p - mu_t) ** 2, axis=-1)
    whr = jnp.trace(sig_p, axis1=-2, axis2=-1) + \
        jnp.trace(sig_t, axis1=-2, axis2=-1)

    # sqrt of product term via closed form for 2x2 SPD matrices
    tr_prod = jnp.trace(sig_p @ sig_t, axis1=-2, axis2=-1)
    det_sqrt = jnp.sqrt(jnp.clip(
        jnp.linalg.det(sig_p) * jnp.linalg.det(sig_t), 1e-7))
    whr = whr - 2 * jnp.sqrt(jnp.clip(tr_prod + 2 * det_sqrt, 1e-7))
    distance = jnp.sqrt(jnp.clip(xy_dist + alpha * alpha * whr, 1e-7))
    if normalize:
        scale = 2 * jnp.clip(jnp.sqrt(jnp.clip(
            jnp.sqrt(jnp.clip(det_sqrt, 1e-7)), 1e-7)), 1e-7)
        distance = distance / scale
    loss = _gd_postprocess_v2(distance, fun, tau)
    return _reduce(loss, weight, avg_factor)


def kfiou_loss(pred, target, pred_decode, targets_decode,
               fun=None, beta=1.0 / 9.0, eps=1e-6,
               weight=None, avg_factor=None):
    """Kalman-filter IoU loss (``kf_iou_loss.py:89``): SmoothL1 on centers
    + (1 - KFIoU) where KFIoU uses the Kalman-update covariance
    Sigma = Sp - Sp(Sp+St)^-1 Sp and Vb = 4*sqrt(det)."""
    xy_p = pred[..., :2]
    xy_t = target[..., :2]
    _, sig_p = obb2gaussian(pred_decode)
    _, sig_t = obb2gaussian(targets_decode)
    diff = jnp.abs(xy_p - xy_t)
    xy_loss = jnp.sum(
        jnp.where(diff < beta, 0.5 * diff * diff / beta,
                  diff - 0.5 * beta), axis=-1)
    vb_p = 4 * jnp.sqrt(jnp.clip(jnp.linalg.det(sig_p), 0))
    vb_t = 4 * jnp.sqrt(jnp.clip(jnp.linalg.det(sig_t), 0))
    k = sig_p @ jnp.linalg.inv(sig_p + sig_t)
    sigma = sig_p - k @ sig_p
    vb = 4 * jnp.sqrt(jnp.clip(jnp.linalg.det(sigma), 0))
    vb = jnp.nan_to_num(vb)
    kfiou = vb / (vb_p + vb_t - vb + eps)
    if fun == "ln":
        kf = -jnp.log(kfiou + eps)
    elif fun == "exp":
        kf = jnp.exp(1 - kfiou) - 1
    else:
        kf = 1 - kfiou
    loss = jnp.clip(xy_loss + kf, 0)
    return _reduce(loss, weight, avg_factor)


def smooth_focal_loss(logits, targets, gamma=2.0, alpha=0.25,
                      weight=None, avg_factor=None):
    """Smooth Focal Loss from CSL (``smooth_focal_loss.py:10``): focal
    BCE against SOFT targets (the circular-smooth-label vectors produced
    by the angle coder). Per-element loss (no class-axis sum — the
    reference reduces over ALL elements / avg_factor); ``weight``
    broadcasts, e.g. (N, 1) positive masks."""
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * targets + p * (1 - targets)
    focal_weight = (alpha * targets + (1 - alpha) * (1 - targets)) * \
        pt ** gamma
    ce = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = ce * focal_weight
    return _reduce(loss, weight, avg_factor)


def _kld_gauss_distance(pred, target):
    """Raw (un-sqrted) KL divergence KL(pred || target) between box
    Gaussians with the TARGET covariance inverted — the v1 direction
    (``gaussian_dist_loss_v1.py:116 kld_loss``; the v2 bag's kld inverts
    the predicted covariance instead, see :func:`_kld_v2_distance`)."""
    mu_p, sig_p = obb2gaussian(pred)
    mu_t, sig_t = obb2gaussian(target)
    delta = (mu_p - mu_t)[..., None]                  # (..., 2, 1)
    inv_t = jnp.linalg.inv(sig_t)
    term1 = jnp.squeeze(
        jnp.swapaxes(delta, -1, -2) @ inv_t @ delta, (-1, -2))
    term2 = jnp.trace(inv_t @ sig_p, axis1=-2, axis2=-1)
    term3 = jnp.log(jnp.clip(
        jnp.linalg.det(sig_t) / jnp.clip(jnp.linalg.det(sig_p), 1e-7),
        1e-7))
    return jnp.clip(0.5 * (term1 + term2 + term3 - 2), 0)


def _kld_v2_distance(pred, target, alpha=1.0, sqrt=True):
    """``gaussian_dist_loss.py:160 kld_loss`` inner distance: the
    PREDICTED covariance is inverted (KL(N_target || N_pred) direction —
    oracle-verified; note v1 inverts the target instead):
    0.5 * d^T Sp^-1 d / alpha^2 + 0.5 Tr(Sp^-1 St)
    + 0.5 (log|Sp| - log|St|) - 1."""
    mu_p, sig_p = obb2gaussian(pred)
    mu_t, sig_t = obb2gaussian(target)
    delta = (mu_p - mu_t)[..., None]                  # (..., 2, 1)
    inv_p = jnp.linalg.inv(sig_p)
    xy_dist = 0.5 * jnp.squeeze(
        jnp.swapaxes(delta, -1, -2) @ inv_p @ delta, (-1, -2))
    whr = 0.5 * jnp.trace(inv_p @ sig_t, axis1=-2, axis2=-1)
    whr = whr + 0.5 * (jnp.log(jnp.clip(jnp.linalg.det(sig_p), 1e-30))
                       - jnp.log(jnp.clip(jnp.linalg.det(sig_t), 1e-30)))
    dist = xy_dist / (alpha * alpha) + whr - 1.0
    if sqrt:
        dist = jnp.sqrt(jnp.clip(dist, 1e-7))
    return dist


def kld_loss(pred, target, fun="log1p", tau=1.0, alpha=1.0, sqrt=True,
             weight=None, avg_factor=None):
    """Kullback-Leibler divergence loss between box Gaussians
    (``gaussian_dist_loss.py:160``)."""
    d = _kld_v2_distance(pred, target, alpha=alpha, sqrt=sqrt)
    return _reduce(_gd_postprocess_v2(d, fun, tau), weight, avg_factor)


def jd_loss(pred, target, fun="log1p", tau=1.0, alpha=1.0, sqrt=True,
            weight=None, avg_factor=None):
    """Jeffreys (symmetric-KL) divergence loss
    (``gaussian_dist_loss.py:206 jd_loss``): mean of both un-sqrted KL
    directions, sqrted then post-processed."""
    jd = 0.5 * (_kld_v2_distance(pred, target, alpha, sqrt=False)
                + _kld_v2_distance(target, pred, alpha, sqrt=False))
    if sqrt:
        jd = jnp.sqrt(jnp.clip(jd, 1e-7))
    return _reduce(_gd_postprocess_v2(jd, fun, tau), weight, avg_factor)


def kld_symmax_loss(pred, target, fun="log1p", tau=1.0, alpha=1.0,
                    sqrt=True, weight=None, avg_factor=None):
    """Symmetric-max KLD (``gaussian_dist_loss.py:243``): elementwise max
    of the two (sqrted) KL directions."""
    d = jnp.maximum(_kld_v2_distance(pred, target, alpha, sqrt=sqrt),
                    _kld_v2_distance(target, pred, alpha, sqrt=sqrt))
    return _reduce(_gd_postprocess_v2(d, fun, tau), weight, avg_factor)


def kld_symmin_loss(pred, target, fun="log1p", tau=1.0, alpha=1.0,
                    sqrt=True, weight=None, avg_factor=None):
    """Symmetric-min KLD (``gaussian_dist_loss.py:274``)."""
    d = jnp.minimum(_kld_v2_distance(pred, target, alpha, sqrt=sqrt),
                    _kld_v2_distance(target, pred, alpha, sqrt=sqrt))
    return _reduce(_gd_postprocess_v2(d, fun, tau), weight, avg_factor)


#: GDLoss variant bag (``gaussian_dist_loss.py:330 BAG_GD_LOSS``).
BAG_GD_LOSS = {
    "gwd": gwd_loss,
    "kld": kld_loss,
    "jd": jd_loss,
    "kld_symmax": kld_symmax_loss,
    "kld_symmin": kld_symmin_loss,
}


# --------------------------------------------------------------------------
# GDLoss_v1 family (gaussian_dist_loss_v1.py) — the "1 - 1/(tau + f(d))"
# normalized forms used by the KLD/GWD paper configs
# --------------------------------------------------------------------------

def _gd_v1_postprocess(dis, fun, tau, weight, avg_factor):
    dis = jnp.clip(dis, 1e-6)
    if fun == "sqrt":
        loss = 1 - 1 / (tau + jnp.sqrt(dis))
    elif fun == "log1p":
        loss = 1 - 1 / (tau + jnp.log1p(dis))
    else:
        loss = 1 - 1 / (tau + dis)
    return _reduce(loss, weight, avg_factor)


def gwd_v1_loss(pred, target, fun="sqrt", tau=2.0,
                weight=None, avg_factor=None):
    """Un-normalized GWD, v1 form (``gaussian_dist_loss_v1.py:38``)."""
    mu_p, sig_p = obb2gaussian(pred)
    mu_t, sig_t = obb2gaussian(target)
    xy_dist = jnp.sum((mu_p - mu_t) ** 2, axis=-1)
    tr = jnp.trace(sig_p, axis1=-2, axis2=-1) + \
        jnp.trace(sig_t, axis1=-2, axis2=-1)
    prod = sig_p @ sig_t
    det_sqrt = jnp.sqrt(jnp.clip(
        jnp.linalg.det(sig_p) * jnp.linalg.det(sig_t), 0))
    tr_prod = jnp.trace(prod, axis1=-2, axis2=-1)
    cross = jnp.sqrt(jnp.clip(tr_prod + 2 * det_sqrt, 0))
    dis = xy_dist + tr - 2 * cross
    if fun not in ("sqrt", "log1p"):
        # v1 'none' branch: log1p(sqrt(d)/scale) with quartic-root scale
        scale = 2 * jnp.clip(jnp.sqrt(jnp.sqrt(jnp.clip(det_sqrt, 0))), 1e-7)
        loss = jnp.log1p(jnp.sqrt(jnp.clip(dis, 1e-6)) / scale)
        return _reduce(loss, weight, avg_factor)
    return _gd_v1_postprocess(dis, fun, tau, weight, avg_factor)


def bcd_loss(pred, target, fun="log1p", tau=1.0,
             weight=None, avg_factor=None):
    """Bhattacharyya distance loss (``gaussian_dist_loss_v1.py:76``):
    d = 0.5*log(det(S)/sqrt(det(Sp)det(St))) + delta^T S^-1 delta / 8,
    S = (Sp + St)/2."""
    mu_p, sig_p = obb2gaussian(pred)
    mu_t, sig_t = obb2gaussian(target)
    delta = (mu_p - mu_t)[..., None]
    sig = 0.5 * (sig_p + sig_t)
    sig_inv = jnp.linalg.inv(sig)
    term1 = jnp.log(jnp.clip(
        jnp.linalg.det(sig)
        / jnp.clip(jnp.sqrt(jnp.clip(
            jnp.linalg.det(sig_t @ sig_p), 0)), 1e-7), 1e-7))
    term2 = jnp.squeeze(
        jnp.swapaxes(delta, -1, -2) @ sig_inv @ delta, (-1, -2))
    dis = 0.5 * term1 + 0.125 * term2
    return _gd_v1_postprocess(dis, fun, tau, weight, avg_factor)


def kld_v1_loss(pred, target, fun="log1p", tau=1.0,
                weight=None, avg_factor=None):
    """KLD, v1 normalized form (``gaussian_dist_loss_v1.py:116``): the
    raw distance is 2x the 0.5-scaled KL used by kld_loss."""
    dis = 2.0 * _kld_gauss_distance(pred, target)
    if fun != "sqrt":
        fun = "log1p"   # v1 kld only has sqrt/log1p branches
    return _gd_v1_postprocess(dis, fun, tau, weight, avg_factor)


#: GDLoss_v1 variant bag (``gaussian_dist_loss_v1.py:170``).
BAG_GD_LOSS_V1 = {
    "gwd": gwd_v1_loss,
    "bcd": bcd_loss,
    "kld": kld_v1_loss,
}


# --------------------------------------------------------------------------
# RepPoints point-set losses
# --------------------------------------------------------------------------

def points_gaussian(pts):
    """Single-Gaussian fit of a point set (the reference fits a
    1-component ``GaussianMixture`` to the 9 RepPoints,
    ``kld_reppoints_loss.py:56`` — with one component EM reduces to the
    sample mean/covariance).

    Args:
        pts: (..., K, 2).
    Returns:
        mu (..., 2), var (..., 2, 2).
    """
    mu = jnp.mean(pts, axis=-2)
    d = pts - mu[..., None, :]
    var = jnp.einsum("...ki,...kj->...ij", d, d) / pts.shape[-2]
    # regularize so det > 0 under jit (reference relies on torch EM floor)
    var = var + 1e-4 * jnp.eye(2, dtype=pts.dtype)
    return mu, var


def poly_gaussian(polys):
    """``gt2gaussian`` (mmrotate/core/bbox/transforms.py:916): quad
    corners -> Gaussian with edge-aligned covariance, L=3 sigma box."""
    L = 3.0
    quad = polys.reshape(polys.shape[:-1] + (4, 2))
    center = jnp.mean(quad, axis=-2)
    edge1 = quad[..., 1, :] - quad[..., 0, :]
    edge2 = quad[..., 2, :] - quad[..., 1, :]
    w = jnp.sum(edge1 * edge1, axis=-1, keepdims=True)
    h = jnp.sum(edge2 * edge2, axis=-1, keepdims=True)
    w_ = jnp.sqrt(jnp.maximum(w, 1e-7))
    cos_sin = edge1 / w_
    # R rows: [cos, -sin], [sin, cos]  (transforms.py:934)
    r0 = cos_sin * jnp.asarray([1.0, -1.0], polys.dtype)
    r1 = cos_sin[..., ::-1]
    R = jnp.stack([r0, r1], axis=-2)
    diag = jnp.zeros(w.shape[:-1] + (2, 2), polys.dtype)
    diag = diag.at[..., 0, 0].set(w[..., 0] / (4 * L * L))
    diag = diag.at[..., 1, 1].set(h[..., 0] / (4 * L * L))
    var = R @ diag @ jnp.swapaxes(R, -1, -2)
    return center, var


def kld_reppoints_loss(pred_pts, target_polys, weight=None,
                       avg_factor=None, eps=1e-6):
    """KLDRepPointsLoss (``kld_reppoints_loss.py:40``): KL divergence
    between the Gaussian fit of the predicted point set and the gt quad's
    Gaussian; loss = 1 - 1/(2 + sqrt(KL))."""
    p_mu, p_var = points_gaussian(pred_pts)
    t_mu, t_var = poly_gaussian(target_polys)
    delta = (p_mu - t_mu)[..., None]
    t_inv = jnp.linalg.inv(t_var + eps * jnp.eye(2, dtype=t_var.dtype))
    term1 = jnp.squeeze(
        jnp.swapaxes(delta, -1, -2) @ t_inv @ delta, (-1, -2))
    term2 = jnp.trace(t_inv @ p_var, axis1=-2, axis2=-1) + jnp.log(
        jnp.clip(jnp.linalg.det(t_var) /
                 jnp.clip(jnp.linalg.det(p_var), 1e-7), 1e-7))
    kld = jnp.clip(0.5 * (term1 + term2) - 1.0, eps)
    loss = 1.0 - 1.0 / (2.0 + jnp.sqrt(kld))
    return _reduce(loss, weight, avg_factor)


def spatial_border_loss(pts, gt_polys, weight, avg_factor=None):
    """SpatialBorderLoss (``spatial_border_loss.py:32``): penalize
    learning points that fall OUTSIDE their assigned gt quad by 0.2x the
    distance to the gt center, averaged over out-border points.

    Args:
        pts: (N, K, 2) point sets; gt_polys: (N, 8) aligned gt quads;
        weight: (N,) positive mask.
    """
    quad = gt_polys.reshape(-1, 4, 2)
    o = quad[:, None, :, :]                        # (N, 1, 4, 2)
    e = jnp.roll(quad, -1, axis=-2)[:, None]
    p = pts[:, :, None, :]                         # (N, K, 1, 2)
    cr = (e[..., 0] - o[..., 0]) * (p[..., 1] - o[..., 1]) - \
         (e[..., 1] - o[..., 1]) * (p[..., 0] - o[..., 0])
    inside = jnp.all(cr >= 0, -1) | jnp.all(cr <= 0, -1)   # (N, K)
    center = jnp.mean(quad, axis=-2)               # (N, 2)
    d = jnp.linalg.norm(pts - center[:, None, :], axis=-1)
    out = (~inside) & (weight[:, None] > 0)
    n_out = jnp.maximum(jnp.sum(out), 1.0)
    loss = jnp.sum(0.2 * d * out) / n_out
    if avg_factor is not None:
        return loss  # already a mean over out-border points
    return loss


def _extreme_corners(pts):
    """(N, K, 2) -> (N, 8) extreme points [left_xy, up_xy, right_xy,
    bottom_xy] (``convex_giou_loss.py:146-169``)."""
    ix_l = jnp.argmin(pts[..., 0], axis=-1)
    ix_r = jnp.argmax(pts[..., 0], axis=-1)
    iy_u = jnp.argmin(pts[..., 1], axis=-1)
    iy_b = jnp.argmax(pts[..., 1], axis=-1)
    take = jnp.take_along_axis
    sel = lambda idx: take(pts, idx[:, None, None], axis=1)[:, 0]  # noqa: E731
    return jnp.concatenate(
        [sel(ix_l), sel(iy_u), sel(ix_r), sel(iy_b)], axis=-1)


def bc_convex_giou_loss(pred_pts, gt_polys, weight=None, avg_factor=None):
    """Border-constrained convex GIoU loss
    (``convex_giou_loss.py:118 BCConvexGIoULossFuction``): smooth-L1 on
    point-set means and extreme corners, aspect-ratio-damped, plus
    ``1 - (1 - 2w) * convex_giou``. Gradients by autodiff (the reference
    routes a hand-written CUDA gradient through a torch Function).

    Args:
        pred_pts: (N, K, 2) predicted point sets.
        gt_polys: (N, 8) assigned gt quads.
    """
    from ..ops.geometry_extras import convex_giou

    n = pred_pts.shape[0]
    gious = convex_giou(pred_pts, gt_polys)

    pred_corners = _extreme_corners(pred_pts)
    target_corners = _extreme_corners(gt_polys.reshape(n, 4, 2))
    pred_mean = jnp.mean(pred_pts, axis=1)
    target_mean = jnp.mean(gt_polys.reshape(n, 4, 2), axis=1)

    beta = 1.0

    def smooth(x):
        ax = jnp.abs(x)
        return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)

    diff_mean_loss = jnp.sum(smooth(pred_mean - target_mean)) / n
    diff_corners_loss = jnp.sum(smooth(pred_corners - target_corners)) / n

    quad = gt_polys.reshape(n, 4, 2)
    edge1 = jnp.linalg.norm(quad[:, 0] - quad[:, 1], axis=-1)
    edge2 = jnp.linalg.norm(quad[:, 1] - quad[:, 2], axis=-1)
    aspect = jnp.maximum(edge1, edge2) / jnp.clip(
        jnp.minimum(edge1, edge2), 1e-6)
    w = jnp.exp(-0.25 * aspect)
    loss = w * (diff_mean_loss + diff_corners_loss) + 1 - (1 - 2 * w) * gious
    return _reduce(loss, weight, avg_factor)
