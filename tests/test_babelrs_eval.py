"""BabelRS (L10) eval-contract tests: score.py / f1_metric.py /
rs_det/caculate.py semantics over hand-verified toy fixtures (the
reference scripts need mmengine/mmrotate-1.x and cannot run here; the
fixtures pin the transcribed control flow, including its quirks —
degree angles fed to radian IoU, double-count confusion cells, the
zero->1 safe denominator, trailing-colon result keys)."""
import json

import numpy as np

from sm3det_tpu.core.evaluation.babelrs_eval import (
    DS_COLLECTIONS, calculate_confusion_matrix, class_map,
    confusion_matrix_to_ap_ar_f1, evaluate_obb_outputs,
    poly2obb_le90_degrees, postprocess_parsed_answer,
    rs_det_evaluate_file, rs_det_evaluation_metrics)


def test_poly2obb_le90_degrees():
    # axis-aligned 40x20 rect at (50, 30): w=longer edge, angle 0 deg
    cx, cy, w, h, a = poly2obb_le90_degrees(
        [30, 20, 70, 20, 70, 40, 30, 40])
    assert abs(cx - 50) < 1e-4 and abs(cy - 30) < 1e-4
    assert abs(w - 40) < 1e-4 and abs(h - 20) < 1e-4
    assert abs(a - 0.0) < 1e-4
    # 45-degree square-ish box: angle reported in DEGREES (score.py:69)
    cx, cy, w, h, a = poly2obb_le90_degrees(
        [0, 0, 10, 10, 0, 20, -10, 10])
    assert abs(a - 45.0) < 1e-3 or abs(a + 45.0) < 1e-3


def test_postprocess_parsed_answer_basic():
    cmap = class_map("RSAR")
    answers = "<ref>ship</ref><box>[[100, 100, 40, 20, 0]]</box>"
    pred = ("ship[[80,90,120,90,120,110,80,110]], "
            "car[[0,0,10,0,10,10,0,10]]")
    ret = postprocess_parsed_answer(answers, pred, 0, cmap, logger=None)
    assert ret is not None
    gi, pi = ret["gt_instances"], ret["pred_instances"]
    assert gi["labels"].tolist() == [cmap["ship"]]
    assert gi["bboxes"].shape == (1, 5)
    assert pi["labels"].tolist() == [cmap["ship"], cmap["car"]]
    assert pi["bboxes"].shape == (2, 5)
    # int truncation of parsed obbs (reference dtype=int) kept
    assert np.all(pi["bboxes"] == np.floor(np.abs(pi["bboxes"])) *
                  np.sign(pi["bboxes"]))
    assert pi["scores"].tolist() == [1, 1]


def test_postprocess_fuzzy_label_and_malformed():
    cmap = class_map("RSAR")
    # fuzzy: 'shp' must recover to 'ship' via rapidfuzz
    ret = postprocess_parsed_answer(
        "<ref>ship</ref><box>[[100, 100, 40, 20, 0]]</box>",
        "shp[[80,90,120,90,120,110,80,110]]", 0, cmap,
        logger=None)
    assert ret["pred_instances"]["labels"].tolist() == [cmap["ship"]]
    # malformed (unclosed bracket) -> None (score.py:272-274)
    assert postprocess_parsed_answer(
        "<ref>ship</ref><box>[[100, 100, 40, 20, 0]]</box>",
        "ship[[80,90,120,90", 0, cmap, logger=None) is None
    # 'No objects detected.' -> empty gts, still parsed
    ret = postprocess_parsed_answer(
        "No objects detected.",
        "ship[[80,90,120,90,120,110,80,110]]", 0, cmap,
        logger=None)
    assert len(ret["gt_instances"]["labels"]) == 0


def test_postprocess_multiround_and_list_answers():
    cmap = class_map("RSAR")
    answers = ["<ref>ship</ref><box>[[10, 10, 8, 4, 0]]</box>",
               "<ref>car</ref><box>[[50, 50, 6, 3, 0], "
               "[70, 70, 6, 3, 0]]</box>"]
    pred = ("detections: ship[[6,8,14,8,14,12,6,12]]|||"
            "car[[47,48,53,48,53,52,47,52]]")
    ret = postprocess_parsed_answer(answers, pred, 0, cmap, logger=None)
    assert ret["gt_instances"]["labels"].tolist() == \
        [cmap["ship"], cmap["car"], cmap["car"]]
    assert ret["pred_instances"]["labels"].tolist() == \
        [cmap["ship"], cmap["car"]]


def test_confusion_matrix_f1_hand_case():
    """2 classes; img: gt [c0, c1], preds: one c0 TP, one c0 on the c1
    gt (cross cell), one background FP c1, one missed -> hand-traced
    cells per analyze_per_img_dets (f1_metric.py:53-90)."""
    def obb(cx, cy):
        return [cx, cy, 10.0, 6.0, 0.0]

    results = [dict(
        gt_instances=dict(
            labels=np.array([0, 1]),
            bboxes=np.array([obb(20, 20), obb(60, 60)], np.float32)),
        pred_instances=dict(
            labels=np.array([0, 0, 1]),
            bboxes=np.array([obb(20, 20), obb(60, 60), obb(200, 200)],
                            np.float32),
            scores=np.array([1, 1, 1])))]
    cm = calculate_confusion_matrix(results, score_thr=0,
                                    tp_iou_thr=0.5)
    # cells: [0,0]=1 (TP), [1,0]=1 (c0 pred on c1 gt), bg[2,1]=1
    # (unmatched c1 pred), FN [1,2]=1 (c1 gt never matched by c1 pred)
    assert cm[0, 0] == 1 and cm[1, 0] == 1 and cm[2, 1] == 1
    assert cm[1, 2] == 1
    ap, ar, f1 = confusion_matrix_to_ap_ar_f1(cm)
    # per-class precision: c0: 1/(1+1)=.5, c1: 0/(0+1)=0, bg 0/... ->
    # mean over 3 rows incl. bg (reference includes the bg row)
    assert abs(ap - (0.5 + 0.0 + 0.0) / 3) < 1e-6
    assert abs(ar - (1.0 + 0.0 + 0.0) / 3) < 1e-6
    expect_f1 = 2 * (ap * ar) / (ap + ar)
    assert abs(f1 - expect_f1) < 1e-6


def test_evaluate_obb_outputs_perfect():
    """Perfect grounding outputs -> mAP 1.0, mF1 > 0, reference JSON
    schema {'mAP', 'mF1', 'outputs'} (score.py:430-449 +
    f1_metric.py:152-165)."""
    data = [
        {"answer": "ship[[80,90,120,90,120,110,80,110]]",
         "gt_answers":
             "<ref>ship</ref><box>[[100, 100, 40, 20, 0]]</box>"},
        {"answer": "car[[10,10,30,10,30,20,10,20]]",
         "gt_answers":
             "<ref>car</ref><box>[[20, 15, 20, 10, 0]]</box>"},
    ]
    res = evaluate_obb_outputs(data, dataset="RSAR")
    assert set(res) == {"mAP", "mF1", "outputs"}
    assert res["mAP"] == 1.0, res
    assert res["outputs"] is data
    assert res["mF1"] > 0.0


def test_rs_det_accuracy():
    outputs = [
        # exact hit
        {"answer": "The box is [[10, 10, 50, 50]]",
         "gt_answers": json.dumps([[10, 10, 50, 50]])},
        # IoU just below 0.5 -> incorrect
        {"answer": "[[10, 10, 50, 50]]",
         "gt_answers": json.dumps([[40, 40, 90, 90]])},
        # no box in answer -> incorrect
        {"answer": "I cannot find it",
         "gt_answers": json.dumps([[0, 0, 10, 10]])},
        # second line carries the box ('\n' split takes line [1])
        {"answer": "Sure!\n[[0, 0, 10, 10]] here",
         "gt_answers": json.dumps([[0, 0, 10, 10]])},
    ]
    res = rs_det_evaluation_metrics(outputs)
    assert res["correct:"] == 2
    assert res["incorrect:"] == 2
    assert res["Total:"] == 4
    assert abs(res["Acc@0.5:"] - 0.5) < 1e-9


def test_rs_det_evaluate_file_schema(tmp_path):
    p = tmp_path / "out.json"
    outputs = [{"answer": "[[0, 0, 10, 10]]",
                "gt_answers": json.dumps([[0, 0, 10, 10]])}]
    p.write_text(json.dumps({"outputs": outputs}))
    res = rs_det_evaluate_file(str(p))
    assert res["Acc@0.5:"] == 1.0
    data = json.loads(p.read_text())
    assert set(data) == {"results", "outputs"}
    assert data["results"]["correct:"] == 1


def test_class_vocabularies_match_reference():
    assert len(DS_COLLECTIONS["DOTA"]) == 15
    assert len(DS_COLLECTIONS["FAIR1M2"]) == 34
    assert DS_COLLECTIONS["RSAR"] == ("ship", "aircraft", "car", "tank",
                                      "bridge", "harbor")
    assert class_map("DOTA")["baseball diamond"] == 1


def test_obb_grounding_f1_core():
    """The per-sample greedy P/R/F1 core (core/evaluation/
    obb_grounding.py) — the simple grounding metric predating the full
    score.py pipeline; fixture: 2 samples, one perfect + one half."""
    from sm3det_tpu.core.evaluation.obb_grounding import obb_grounding_f1
    b = lambda cx, cy: [cx, cy, 20.0, 10.0, 0.0]  # noqa: E731
    res = obb_grounding_f1(
        pred_obbs=[np.array([b(50, 50)], np.float32),
                   np.array([b(10, 10), b(200, 200)], np.float32)],
        gt_obbs=[np.array([b(50, 50)], np.float32),
                 np.array([b(10, 10), b(400, 400)], np.float32)])
    assert res["tp"] == 2 and res["fp"] == 1 and res["fn"] == 1
    assert abs(res["precision"] - 2 / 3) < 1e-9
    assert abs(res["recall"] - 2 / 3) < 1e-9
    assert abs(res["f1"] - 2 / 3) < 1e-9
