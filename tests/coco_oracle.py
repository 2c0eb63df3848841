"""Test-only oracle: a LITERAL transcription of pycocotools
``COCOeval`` (bbox) — dict-per-annotation, python triple loops, the
exact control flow of ``cocoeval.py`` (evaluateImg/accumulate) and
``maskUtils.iou`` box semantics. Deliberately unoptimized and
structurally independent of the production vectorized implementation
in ``sm3det_tpu/core/evaluation/coco_eval.py`` so randomized
differential tests catch vectorization bugs in either.

pycocotools itself is not installed in this environment; the analytic
fixtures in test_coco_eval.py pin the true protocol semantics
(101-point interpolation, envelope, maxDets, area ranges, crowd).
"""
import numpy as np

AREA_RNGS = [(0.0, 1e5 ** 2), (0.0, 32 ** 2), (32 ** 2, 96 ** 2),
             (96 ** 2, 1e5 ** 2)]
REC_THRS = np.linspace(0.0, 1.00, 101)


def _box_iou(d, g, iscrowd):
    """maskUtils.iou for [x, y, w, h] boxes."""
    D, G = len(d), len(g)
    out = np.zeros((D, G))
    for i in range(D):
        dx, dy, dw, dh = d[i]
        da = dw * dh
        for j in range(G):
            gx, gy, gw, gh = g[j]
            ga = gw * gh
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union
    return out


def evaluate_img(gts, dts, iou_thrs, arng, max_det):
    """cocoeval.COCOeval.evaluateImg, verbatim control flow.

    gts: list of dicts with 'bbox' [x,y,w,h], 'area', 'iscrowd',
    'ignore', 'id'. dts: dicts with 'bbox', 'score', 'id', 'area'.
    """
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        g["_ignore"] = 1 if (g["ignore"] or g["area"] < arng[0]
                             or g["area"] > arng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gt = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dt = [dts[i] for i in dtind[:max_det]]
    iscrowd = [int(g["iscrowd"]) for g in gt]
    ious = _box_iou([d["bbox"] for d in dt], [g["bbox"] for g in gt],
                    iscrowd) if len(gt) and len(dt) else np.zeros(
                        (len(dt), len(gt)))

    T = len(iou_thrs)
    G, D = len(gt), len(dt)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gtIg = np.array([g["_ignore"] for g in gt])
    dtIg = np.zeros((T, D))
    if len(gt) or len(dt):
        for tind, t in enumerate(iou_thrs):
            for dind, d in enumerate(dt):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = gt[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array([d["area"] < arng[0] or d["area"] > arng[1]
                  for d in dt]).reshape((1, len(dt)))
    dtIg = np.logical_or(dtIg, np.logical_and(
        dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtIgnore": dtIg,
        "gtIgnore": gtIg,
        "dtScores": [d["score"] for d in dt],
    }


def coco_eval_oracle(images, iou_thrs=None, max_dets=(100, 300, 1000),
                     num_classes=1):
    """cocoeval evaluate+accumulate+summarize, verbatim.

    images: list of (gts, dts) where gts/dts are dicts with 'bbox'
    [x,y,w,h], 'category_id', 'area', 'iscrowd'/'ignore', 'score'.
    Returns dict with the 12 summarize stats.
    """
    if iou_thrs is None:
        iou_thrs = np.linspace(0.5, 0.95, 10)
    iou_thrs = np.asarray(iou_thrs)
    max_dets = sorted(max_dets)
    # assign ids (pycocotools: nonzero annotation ids)
    next_id = 1
    for gts, dts in images:
        for g in gts:
            g["id"] = next_id
            next_id += 1
            g.setdefault("iscrowd", 0)
            g.setdefault("ignore", g["iscrowd"])
            g["ignore"] = g["ignore"] or g["iscrowd"]
            g.setdefault("area", g["bbox"][2] * g["bbox"][3])
        for d in dts:
            d["id"] = next_id
            next_id += 1
            d.setdefault("area", d["bbox"][2] * d["bbox"][3])

    T, R = len(iou_thrs), len(REC_THRS)
    K, A, M = num_classes, len(AREA_RNGS), len(max_dets)
    # evalImgs[k][a][i]
    eval_imgs = [[[evaluate_img(
        [g for g in gts if g["category_id"] == k],
        [d for d in dts if d["category_id"] == k],
        iou_thrs, arng, max_dets[-1])
        for (gts, dts) in images] for arng in AREA_RNGS]
        for k in range(K)]

    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k in range(K):
        for a in range(A):
            for m, mdet in enumerate(max_dets):
                E = [e for e in eval_imgs[k][a] if e is not None]
                if len(E) == 0:
                    continue
                dt_scores = np.concatenate(
                    [e["dtScores"][0:mdet] for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dt_scores_sorted = dt_scores[inds]
                dtm = np.concatenate(
                    [e["dtMatches"][:, 0:mdet] for e in E],
                    axis=1)[:, inds]
                dtIg = np.concatenate(
                    [e["dtIgnore"][:, 0:mdet] for e in E],
                    axis=1)[:, inds]
                gtIg = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gtIg == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dtIg))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dtIg))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t in range(T):
                    tp = np.array(tp_sum[t])
                    fp = np.array(fp_sum[t])
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds2 = np.searchsorted(rc, REC_THRS, side="left")
                    try:
                        for ri, pi in enumerate(inds2):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a, m] = np.array(q)

    def summarize(ap, iouThr=None, areaRng="all", maxDets=100):
        aind = ["all", "small", "medium", "large"].index(areaRng)
        mind = max_dets.index(maxDets)
        if ap:
            s = precision
            if iouThr is not None:
                tt = np.where(np.isclose(iou_thrs, iouThr))[0]
                s = s[tt]
            s = s[:, :, :, aind, mind]
        else:
            s = recall
            if iouThr is not None:
                tt = np.where(np.isclose(iou_thrs, iouThr))[0]
                s = s[tt]
            s = s[:, :, aind, mind]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    last = max_dets[-1]
    return {
        "mAP": summarize(True, maxDets=last),
        "mAP_50": summarize(True, iouThr=0.5, maxDets=last),
        "mAP_75": summarize(True, iouThr=0.75, maxDets=last),
        "mAP_s": summarize(True, areaRng="small", maxDets=last),
        "mAP_m": summarize(True, areaRng="medium", maxDets=last),
        "mAP_l": summarize(True, areaRng="large", maxDets=last),
        "AR@0": summarize(False, maxDets=max_dets[0]),
        "AR@1": summarize(False, maxDets=max_dets[1]),
        "AR@2": summarize(False, maxDets=last),
        "AR_s": summarize(False, areaRng="small", maxDets=last),
        "AR_m": summarize(False, areaRng="medium", maxDets=last),
        "AR_l": summarize(False, areaRng="large", maxDets=last),
    }
