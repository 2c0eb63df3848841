"""BabelRS (L10) eval-format contracts.

Re-implements the reference VLM-eval scoring pipeline exactly:

- ``BabelRS_pretrain/eval/obb/score.py`` — parse chat-format OBB
  grounding outputs (``<ref>cls</ref><box>[poly]</box>`` ground truth;
  ``cls[poly...]`` predictions with rapidfuzz label matching and
  ``poly2obb_le90`` degree-angle conversion), score mAP, and write the
  ``{'mAP': ..., 'outputs': ...}`` JSON schema (``score.py:430-449``).
- ``BabelRS_pretrain/eval/obb/f1_metric.py`` — confusion-matrix
  AP/AR/F1 over the parsed per-image instances
  (``calculate_confusion_matrix``/``analyze_per_img_dets``/
  ``confusion_matrix_to_ap_ar_f1``, ``f1_metric.py:35-106``), appending
  ``mF1`` to the same JSON (``f1_metric.py:152-165``).
- ``BabelRS_pretrain/eval/domain_specific/rs_det/caculate.py`` — HBB
  grounding Acc@0.5 over single-box answers (``evaluation_metrics``,
  the +1 inclusive-pixel IoU, regex box extraction and the exact
  result-dict keys, ``caculate.py:52-117``) and its
  ``{'results': ..., 'outputs': ...}`` schema.

Everything is host-side numpy (the reference path is CPU torch +
mmengine); rotated IoU uses this repo's fixture-pinned op.
"""

from __future__ import annotations

import ast
import json
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

# score.py:15-37 ds_collections (class vocabularies per benchmark)
DS_COLLECTIONS = {
    "DOTA": (
        "plane", "baseball-diamond", "bridge", "ground-track-field",
        "small-vehicle", "large-vehicle", "ship", "tennis-court",
        "basketball-court", "storage-tank", "soccer-ball-field",
        "roundabout", "harbor", "swimming-pool", "helicopter"),
    "FAIR1M2": (
        "Boeing737", "Boeing747", "Boeing777", "Boeing787", "C919",
        "A220", "A321", "A330", "A350", "ARJ21", "Passenger Ship",
        "Motorboat", "Fishing Boat", "Tugboat", "Engineering Ship",
        "Liquid Cargo Ship", "Dry Cargo Ship", "Warship", "Small Car",
        "Bus", "Cargo Truck", "Dump Truck", "Van", "Trailer", "Tractor",
        "Excavator", "Truck Tractor", "Basketball Court", "Tennis Court",
        "Football Field", "Baseball Field", "Intersection", "Roundabout",
        "Bridge"),
    "RSAR": ("ship", "aircraft", "car", "tank", "bridge", "harbor"),
    "SRSDD": ("Cell-Container", "Container", "Dredger", "Fishing",
              "Law Enforce", "ore-oil", "bulk cargo"),
}


def class_map(dataset: str) -> Dict[str, int]:
    """score.py:438-440: lowercase, '-' -> ' '."""
    return {c.replace("-", " ").lower(): i
            for i, c in enumerate(DS_COLLECTIONS[dataset])}


def _norm_angle_le90(angle: np.ndarray) -> np.ndarray:
    return (angle + np.pi / 2) % np.pi - np.pi / 2


def poly2obb_le90_degrees(poly: Sequence[float]) -> tuple:
    """score.py:40-74 ``poly2obb_le90``: 8-coord polygon ->
    (cx, cy, w, h, angle_degrees), le90 normalization, w = longer edge.
    (Note: the reference returns the angle in DEGREES — a deliberate
    quirk of this eval path, kept for parity.)"""
    p = np.asarray(poly, np.float32).reshape(4, 2)
    pt1, pt2, pt3, pt4 = p
    edge1 = float(np.hypot(pt1[0] - pt2[0], pt1[1] - pt2[1]))
    edge2 = float(np.hypot(pt2[0] - pt3[0], pt2[1] - pt3[1]))
    if edge1 > edge2:
        angle = float(np.arctan2(pt2[1] - pt1[1], pt2[0] - pt1[0]))
    else:
        angle = float(np.arctan2(pt4[1] - pt1[1], pt4[0] - pt1[0]))
    angle = float(_norm_angle_le90(np.asarray(angle))) * 180.0 / np.pi
    cx = (pt1[0] + pt3[0]) / 2.0
    cy = (pt1[1] + pt3[1]) / 2.0
    w = max(edge1, edge2)
    h = min(edge1, edge2)
    return (float(cx), float(cy), float(w), float(h), angle)


def postprocess_parsed_answer(answers, pred: str,
                              image_id: int,
                              cls_map: Dict[str, int],
                              logger=print) -> Optional[Dict]:
    """score.py:211-333 ``postprocess_parsed_answer``: parse one
    sample's gt chat answer(s) + model prediction into per-image
    gt/pred instance dicts (numpy). Returns None when the prediction is
    malformed (unclosed bracket / unparseable box), matching the
    reference's skip semantics."""
    gt_labels: List[int] = []
    gt_bboxes: List = []
    if isinstance(answers, list):
        for answer in answers:
            ans_labels = re.findall(r"<ref>(.*?)</ref>", answer)
            ans_boxes = re.findall(r"<box>(.*?)</box>", answer)
            if ans_boxes == []:
                continue
            labels = [cls_map[a.replace("-", " ").strip()]
                      for a in ans_labels]
            boxes = [ast.literal_eval(b) for b in ans_boxes]
            for lab, box_group in zip(labels, boxes):
                for b in box_group:
                    gt_labels.append(lab)
                    gt_bboxes.append(b)
    else:
        if answers != "No objects detected.":
            answers = answers.replace("-", " ")
            ans_labels = re.findall(r"<ref>(.*?)</ref>", answers)
            ans_boxes = re.findall(r"<box>(.*?)</box>", answers)
            labels = [cls_map[a] for a in ans_labels]
            boxes = [ast.literal_eval(b) for b in ans_boxes]
            for lab, box_group in zip(labels, boxes):
                for b in box_group:
                    gt_labels.append(lab)
                    gt_bboxes.append(b)

    if "|||" in pred:
        preds = pred.split(":")[-1].strip().split("|||")
    else:
        preds = pred.split(":")[-1].strip().split(", ")
    pred_labels, pred_boxes = [], []
    for pr in preds:
        pr = pr.split(". ")[-1]
        lab = re.findall(r"(.*?)\[", pr)
        if lab == []:
            continue
        lab = lab[0]
        pred_labels.append(lab)
        box_str = pr.replace(lab, "")
        if box_str[-1] != "]":
            return None
        try:
            pred_boxes.append(ast.literal_eval(box_str))
        except (SyntaxError, ValueError):
            if logger:
                logger(f"Error: {box_str} can not be read")
            return None

    all_bboxes, all_labels, all_scores = [], [], []
    for lab, box_group in zip(pred_labels, pred_boxes):
        if lab.strip() == "":
            continue
        if lab in cls_map:
            label = cls_map[lab.lower()]
        else:
            # score.py:289-296: rapidfuzz fuzzy label recovery
            from rapidfuzz import process
            matched = process.extractOne(lab.lower(),
                                         list(cls_map.keys()))[0]
            if logger:
                logger(f"Fuzzy matched {lab.lower()} to {matched}")
            label = cls_map[matched]
        for box in box_group:
            if len(box) != 8:
                if logger:
                    logger(f"get wrong pred_bbox: {box}")
                continue
            all_bboxes.append(poly2obb_le90_degrees(box))
            all_scores.append(1)
            all_labels.append(label)

    gt_arr = np.empty((1, 5), np.float32) if gt_bboxes == [] else \
        np.asarray(gt_bboxes, np.int64).astype(np.float32)
    pred_arr = np.empty((1, 5), np.float32) if all_bboxes == [] else \
        np.asarray(all_bboxes, np.float32).astype(np.int64).astype(
            np.float32)   # reference stores dtype=int: truncation kept
    return dict(
        img_id=image_id,
        gt_instances=dict(
            labels=np.asarray(gt_labels, np.int64), bboxes=gt_arr),
        pred_instances=dict(
            labels=np.asarray(all_labels, np.int64), bboxes=pred_arr,
            scores=np.asarray(all_scores, np.int64)))


def _rotated_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    import jax

    from ...ops.rotated_iou import box_iou_rotated
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(box_iou_rotated(
            np.asarray(a, np.float32), np.asarray(b, np.float32)))


# Parity note (deliberate reference quirk, kept): score.py's parser
# stores angles in DEGREES (poly2obb_le90 converts, score.py:69), yet
# f1_metric.py/DOTAMetric feed those boxes straight into mmrotate's
# radian-convention rbbox_overlaps (f1_metric.py:75). The reference
# therefore scores IoU with degree values in the angle slot; we do the
# same (no conversion) so numbers match.


def _qbox2rbox(q: np.ndarray) -> np.ndarray:
    """8-coord gt fallback (f1_metric.py:62-63 qbox2rbox): min-area
    rotated box per quadrilateral (radian-angle output like mmrotate)."""
    from ...ops.box_convert import poly2obb_np
    return np.stack([poly2obb_np(row, version="le90")
                     for row in np.asarray(q, np.float32)])


def get_num_classes(results: List[Dict]) -> int:
    """f1_metric.py:24-32 (from gt label range)."""
    min_id, max_id = 0, -1
    for r in results:
        labels = r["gt_instances"]["labels"]
        if len(labels) > 0:
            min_id = min(min_id, int(labels.min()))
            max_id = max(max_id, int(labels.max()))
    return max_id - min_id + 1


def analyze_per_img_dets(confusion_matrix, gt_instances, pred_instances,
                         score_thr=0, tp_iou_thr=0.5):
    """f1_metric.py:53-90 verbatim semantics (boxes here carry DEGREE
    angles from the parser; IoU converts to radians internally). A det
    overlapping multiple gts increments multiple cells — the
    reference's double-count behavior, kept."""
    gt_bboxes = np.asarray(gt_instances["bboxes"], np.float32)
    if gt_bboxes.ndim == 2 and gt_bboxes.shape[1] == 8:
        gt_bboxes = _qbox2rbox(gt_bboxes)
    gt_labels = np.asarray(gt_instances["labels"])
    true_positives = np.zeros(len(gt_labels))
    unique_label = np.unique(pred_instances["labels"])
    for det_label in unique_label:
        mask = pred_instances["labels"] == det_label
        det_bboxes = np.asarray(pred_instances["bboxes"],
                                np.float32)[mask]
        det_scores = np.asarray(pred_instances["scores"])[mask]
        # raw angle values on purpose (degree-as-radian quirk above)
        ious = _rotated_iou(det_bboxes[:, :5], gt_bboxes) \
            if len(det_bboxes) and len(gt_bboxes) else \
            np.zeros((len(det_bboxes), len(gt_bboxes)))
        for i, score in enumerate(det_scores):
            det_match = 0
            if score >= score_thr:
                for j, gt_label in enumerate(gt_labels):
                    if ious[i, j] >= tp_iou_thr:
                        det_match += 1
                        if gt_label == det_label:
                            true_positives[j] += 1
                        confusion_matrix[gt_label, det_label] += 1
                if det_match == 0:
                    confusion_matrix[-1, det_label] += 1
    for num_tp, gt_label in zip(true_positives, gt_labels):
        if num_tp == 0:
            confusion_matrix[gt_label, -1] += 1
    return confusion_matrix


def calculate_confusion_matrix(results: List[Dict], score_thr=0,
                               tp_iou_thr=0.5) -> np.ndarray:
    """f1_metric.py:35-50."""
    n = get_num_classes(results)
    cm = np.zeros((n + 1, n + 1))
    for r in results:
        cm = analyze_per_img_dets(cm, r["gt_instances"],
                                  r["pred_instances"], score_thr,
                                  tp_iou_thr)
    return cm


def confusion_matrix_to_ap_ar_f1(cm: np.ndarray):
    """f1_metric.py:92-106 (incl. the zero->1 safe denominator)."""
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp

    def _safe(arr):
        arr = arr.copy()
        arr[arr == 0] = 1
        return arr

    precision = tp / _safe(tp + fp)
    recall = tp / _safe(tp + fn)
    ap = float(np.mean(precision))
    ar = float(np.mean(recall))
    f1 = 2 * (ap * ar) / (ap + ar) if (ap + ar) else 0.0
    return ap, ar, f1


def evaluate_obb_outputs(data: List[Dict], dataset: str = "DOTA",
                         score_thrs=(0.9,), tp_iou_thrs=(0.5,),
                         logger=None) -> Dict:
    """Full score.py + f1_metric.py pipeline over chat outputs
    (list of {'answer': pred_str, 'gt_answers': ...}): parse ->
    mAP (DOTAMetric analog: VOC AP@0.5 via eval_rbbox_map over the
    parsed instances) -> confusion-matrix mF1 -> the reference's output
    JSON schema {'mAP', 'mF1', 'outputs'}."""
    from .eval_map import eval_rbbox_map

    cmap = class_map(dataset)
    nc = len(DS_COLLECTIONS[dataset])
    results = []
    for i, sample in enumerate(data):
        answers = sample["gt_answers"]
        if not isinstance(answers, list) and isinstance(answers, dict):
            answers = answers["value"]
        ret = postprocess_parsed_answer(answers, sample["answer"], i,
                                        cmap, logger=logger)
        if ret is None:
            continue
        results.append(ret)

    # DOTAMetric(metric='mAP') analog: VOC-style AP@0.5 over instances
    det_results, annotations = [], []
    for r in results:
        pi, gi = r["pred_instances"], r["gt_instances"]
        per_class = []
        for c in range(nc):
            m = np.asarray(pi["labels"]) == c
            boxes = np.asarray(pi["bboxes"], np.float32)[m] \
                if m.any() else np.zeros((0, 5), np.float32)
            scores = np.asarray(pi["scores"])[m].astype(np.float32) \
                if m.any() else np.zeros((0,), np.float32)
            per_class.append(
                np.concatenate([boxes, scores[:, None]], -1))
        det_results.append(per_class)
        gt_b = np.asarray(gi["bboxes"], np.float32) \
            if len(gi["labels"]) else np.zeros((0, 5), np.float32)
        if gt_b.ndim == 2 and gt_b.shape[1] == 8:
            gt_b = _qbox2rbox(gt_b)
        annotations.append(dict(
            bboxes=gt_b, labels=np.asarray(gi["labels"], np.int64)))
    if det_results:
        res = eval_rbbox_map(det_results, annotations, iou_thrs=[0.5],
                             logger=None)
        mAP = float(res["mAP50"])
    else:
        mAP = 0.0

    all_f1 = []
    for score_thr in score_thrs:
        for tp_iou_thr in tp_iou_thrs:
            cm = calculate_confusion_matrix(results, score_thr,
                                            tp_iou_thr)
            _, _, f1 = confusion_matrix_to_ap_ar_f1(cm)
            all_f1.append(f1)
    return {"mAP": mAP, "mF1": sum(all_f1) / len(all_f1),
            "outputs": data}


# ---------------------------------------------------------------------------
# rs_det (HBB grounding accuracy)

def _rs_det_iou(box1, box2):
    """caculate.py:6-20 verbatim (+1 inclusive-pixel convention)."""
    x1, y1, x2, y2 = box1
    x3, y3, x4, y4 = box2
    ix1, iy1 = max(x1, x3), max(y1, y3)
    ix2, iy2 = min(x2, x4), min(y2, y4)
    inter = max(0, ix2 - ix1 + 1) * max(0, iy2 - iy1 + 1)
    a1 = (x2 - x1 + 1) * (y2 - y1 + 1)
    a2 = (x4 - x3 + 1) * (y4 - y3 + 1)
    return inter / (a1 + a2 - inter)


def rs_det_evaluation_metrics(outputs: List[Dict],
                              logger=None) -> Dict:
    """caculate.py:52-117 ``evaluation_metrics``: Acc@0.5 of single-box
    grounding answers; returns the reference's exact result dict
    (including its trailing-colon keys)."""
    correct = incorrect = 0
    pattern = r"\[*\[.*?,.*?,.*?,.*?\]\]*"
    for output in outputs:
        bbox = json.loads(output["gt_answers"])[0]
        pred = output["answer"]
        if "\n" in pred:
            pred = pred.split("\n")[1]
        matches = re.findall(pattern, pred)
        if len(matches) == 0:
            incorrect += 1
            continue
        try:
            pred_bbox = json.loads(matches[0])[0]
            iou = _rs_det_iou(pred_bbox, bbox)
            if iou > 0.5:
                correct += 1
            else:
                incorrect += 1
        except Exception as e:      # noqa: BLE001 (reference behavior)
            if logger:
                logger(f"{e}: {output}")
            incorrect += 1
    total = correct + incorrect
    return {
        "correct:": correct,
        "incorrect:": incorrect,
        "Total:": total,
        "Acc@0.5:": correct / total if total else 0.0,
    }


def rs_det_evaluate_file(output_file: str) -> Dict:
    """caculate.py __main__: read {'outputs': [...]} (or a bare list),
    score, and REWRITE the file as {'results', 'outputs'}."""
    from ...utils import fileio
    data = fileio.load(output_file, file_format="json")
    if "outputs" in data:
        data = data["outputs"]
    results = rs_det_evaluation_metrics(data)
    fileio.dump({"results": results, "outputs": data}, output_file,
                file_format="json")
    return results
