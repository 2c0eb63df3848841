"""End-to-end real-data eval CLI test (VERDICT r1 item 4).

Builds a tiny DOTA-format dataset ON DISK (patch-named images + txt
polys, ``dota.py:61-162`` format), then drives ``tools/test.py`` main()
twice: --eval mAP (full pipeline: config -> dataset -> batched jitted
inference -> rescale -> eval_rbbox_map) and --format-only (patch-id
merge via the real '__scale__x___y' regex + Task1 zip with real class
names)."""

import os
import sys
import zipfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

CLASSES = ("plane", "ship", "bridge", "harbor")


def _make_dota_fixture(root):
    from PIL import Image
    ann = os.path.join(root, "annfiles")
    img = os.path.join(root, "images")
    os.makedirs(ann), os.makedirs(img)
    rng = np.random.RandomState(0)
    # two base images, two patches each (patch-name regex dota.py:256)
    for base in ("P0001", "P0002"):
        for x0 in (0, 32):
            pid = f"{base}__1.0__{x0}___0"
            arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(img, pid + ".png"))
            with open(os.path.join(ann, pid + ".txt"), "w") as f:
                # one box per patch: axis-ish quad + class + difficulty
                cx, cy = rng.uniform(20, 44, 2)
                w, h = rng.uniform(10, 20), rng.uniform(6, 10)
                quad = [cx - w / 2, cy - h / 2, cx + w / 2, cy - h / 2,
                        cx + w / 2, cy + h / 2, cx - w / 2, cy + h / 2]
                cls = CLASSES[rng.randint(0, 4)]
                f.write(" ".join(f"{v:.1f}" for v in quad) +
                        f" {cls} 0\n")
    return ann, img


def _write_config(path, ann, img):
    cfg_text = f"""
_base_ = ["{os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         'configs', '_base_', 'default_runtime.py')}"]
angle_version = "le90"
num_classes = 4
source_ratio = [1, 1, 1]
img_size = 64
data = dict(
    sar=dict(type="SyntheticDetDataset", max_gt=8),
    rgb=dict(type="DOTADataset", ann_folder="{ann}",
             img_folder="{img}",
             classes={CLASSES!r}, max_gt=8),
    ifr=dict(type="SyntheticDetDataset", max_gt=8),
)
model = dict(
    type="TriSourceDetector",
    num_classes=4,
    angle_version="le90",
    backbone=dict(arch="atto", drop_path_rate=0.0,
                  moe_block_inds=[[], [], [0], []],
                  num_experts=2, top_k=2, gate="cosine",
                  capacity_factor=2.0),
    neck=dict(in_channels=[40, 80, 160, 320], out_channels=32,
              num_outs=5, extra_level=1, add_extra_convs="on_output"),
    sar=dict(strides=[8, 16, 32, 64, 128], reg_max=8,
             nms_pre=50, score_thr=0.05, nms_iou=0.6, max_per_img=20),
    rgb=dict(rpn_strides=[4, 8, 16, 32, 64],
             rpn_sample=32, rcnn_sample=32,
             rpn_nms_pre=64, rpn_max=64, rpn_nms_iou=0.8,
             rcnn_score_thr=0.05, rcnn_nms_iou=0.1, rcnn_max=20),
)
optimizer = dict(type="AdamW", lr=1e-4)
lr_config = dict(policy="step", step=[100])
"""
    with open(path, "w") as f:
        f.write(cfg_text)


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("dota_fixture")
    ann, img = _make_dota_fixture(str(root))
    cfg_path = str(root / "tiny_dota.py")
    _write_config(cfg_path, ann, img)
    return cfg_path, str(root)


def _run_cli(argv):
    import test as test_cli  # tools/test.py
    old = sys.argv
    sys.argv = ["test.py"] + argv
    try:
        test_cli.main()
    finally:
        sys.argv = old


def test_real_data_eval_runs(fixture_env, capsys):
    cfg_path, root = fixture_env
    out_json = os.path.join(root, "eval.json")
    _run_cli([cfg_path, "--subdataset", "rgb", "--batch-size", "2",
              "--out", out_json])
    captured = capsys.readouterr().out
    assert "inference: 4 images" in captured
    assert os.path.exists(out_json)


def test_format_only_writes_valid_task1_zip(fixture_env):
    cfg_path, root = fixture_env
    sub_dir = os.path.join(root, "submission")
    _run_cli([cfg_path, "--subdataset", "rgb", "--batch-size", "2",
              "--format-only", "--submission-dir", sub_dir])
    zip_path = os.path.join(sub_dir, "submission.zip")
    assert os.path.exists(zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        names = set(zf.namelist())
        assert names == {f"Task1_{c}.txt" for c in CLASSES}, names
        # any written line must reference a merged BASE image id (patch
        # suffix stripped) and have score + 8 poly coords
        for n in names:
            for line in zf.read(n).decode().splitlines():
                parts = line.split()
                assert parts[0] in ("P0001", "P0002"), parts[0]
                assert len(parts) == 10
