"""Data pipeline + sampler + checkpoint-ingestion tests."""

import numpy as np

from sm3det_tpu.data.datasets import SyntheticDetDataset
from sm3det_tpu.data.loader import (MODALITIES, PipelineCfg,
                                    TriSourceLoader, run_pipeline)
from sm3det_tpu.data.sampler import MultiSourceSampler
from sm3det_tpu.data import transforms as T


def test_multi_source_sampler_composition():
    sampler = MultiSourceSampler([100, 50, 30], [2, 1, 1], seed=0)
    it = iter(sampler)
    for _ in range(5):
        batch = next(it)
        sources = [s for s, _ in batch]
        assert sources == [0, 0, 1, 2]
        for s, i in batch:
            assert 0 <= i < [100, 50, 30][s]


def test_multi_source_sampler_host_disjoint():
    """Two hosts must draw disjoint strides of each permutation stream."""
    s0 = MultiSourceSampler([40], [4], seed=1, host_id=0, num_hosts=2)
    s1 = MultiSourceSampler([40], [4], seed=1, host_id=1, num_hosts=2)
    i0 = [i for _, i in next(iter(s0))]
    i1 = [i for _, i in next(iter(s1))]
    assert not set(i0) & set(i1)


def test_sampler_deterministic():
    a = [next(iter(MultiSourceSampler([30, 20, 10], [2, 1, 1], seed=7)))
         for _ in range(1)]
    b = [next(iter(MultiSourceSampler([30, 20, 10], [2, 1, 1], seed=7)))
         for _ in range(1)]
    assert a == b


def test_run_pipeline_static_shapes():
    ds = SyntheticDetDataset(n=4, img_size=100, box_type="obb", seed=0)
    cfg = PipelineCfg(img_size=64, max_gt=10, rotate_ratio=0.5)
    rng = np.random.RandomState(0)
    for i in range(4):
        s = run_pipeline(rng, ds.get_raw(i), cfg, train=True)
        assert s["img"].shape == (64, 64, 3)
        assert s["gt_obbs"].shape == (10, 5)
        assert s["gt_labels"].shape == (10,)
        assert s["gt_mask"].shape == (10,)
        assert s["gt_mask"].sum() >= 0


def test_trisource_loader_batch_layout():
    datasets = [SyntheticDetDataset(n=8, img_size=64,
                                    box_type="hbb" if i == 0 else "obb",
                                    seed=i) for i in range(3)]
    pipes = [PipelineCfg(img_size=64, max_gt=6)] * 3
    loader = TriSourceLoader(datasets, [2, 1, 1], pipes, seed=0)
    batch = next(iter(loader))
    assert set(batch.keys()) == set(MODALITIES)
    assert batch["sar"]["img"].shape == (2, 64, 64, 3)
    assert batch["rgb"]["img"].shape == (1, 64, 64, 3)
    assert "gt_bboxes" in batch["sar"] and "gt_obbs" in batch["rgb"]


def test_resize_scales_boxes():
    img = np.zeros((100, 200, 3), np.float32)
    obbs = np.array([[100, 50, 40, 20, 0.3]], np.float32)
    out, ob, _, (sx, sy) = T.resize(img, (50, 100), obbs=obbs)
    assert out.shape[:2] == (50, 100)
    assert np.isclose(ob[0, 0], 50)
    assert np.isclose(ob[0, 2], 40 * np.sqrt(sx * sy))


def test_flip_remaps_angle():
    rng = np.random.RandomState(0)
    img = np.zeros((64, 64, 3), np.float32)
    obbs = np.array([[20, 30, 10, 4, 0.5]], np.float32)
    out, ob, _, flipped = T.random_flip(rng, img, obbs, None, prob=1.0)
    assert flipped
    assert np.isclose(ob[0, 0], 44)
    assert np.isclose(ob[0, 4], -0.5)


def test_convnext_expert_fanout():
    """Dense FFN checkpoint replicates into every expert."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sm3det_tpu.models.backbones.convnext import ConvNeXtMoE
    from sm3det_tpu.train.checkpoint import convnext_torch_to_jax

    model = ConvNeXtMoE(arch="atto", moe_block_inds=((), (), (0,), ()),
                        num_experts=2, top_k=2, multi_input=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    # fake torch state dict for the MoE block's dense FFN
    dim = 160
    sd = {
        "backbone.stages.2.0.ffn.pointwise_conv1.weight":
            np.random.rand(4 * dim, dim).astype(np.float32),
        "backbone.stages.2.0.ffn.pointwise_conv1.bias":
            np.random.rand(4 * dim).astype(np.float32),
        "backbone.stages.2.0.ffn.pointwise_conv2.weight":
            np.random.rand(dim, 4 * dim).astype(np.float32),
        "backbone.stages.2.0.ffn.pointwise_conv2.bias":
            np.random.rand(dim).astype(np.float32),
        "backbone.stages.2.0.depthwise_conv.weight":
            np.random.rand(dim, 1, 7, 7).astype(np.float32),
        "backbone.stages.2.0.depthwise_conv.bias":
            np.random.rand(dim).astype(np.float32),
        "backbone.stages.2.0.norm.weight":
            np.random.rand(dim).astype(np.float32),
        "backbone.stages.2.0.norm.bias":
            np.random.rand(dim).astype(np.float32),
    }
    loaded = convnext_torch_to_jax(sd, {"backbone": params},
                                   num_experts=2)["backbone"]
    experts = loaded["stage2_block0"]["ffn"]["experts"]
    w1 = np.asarray(experts["w1"])
    assert w1.shape[0] == 2
    # every expert identical = replicated from the dense FFN
    assert np.allclose(w1[0], w1[1])
    assert np.allclose(
        w1[0], sd["backbone.stages.2.0.ffn.pointwise_conv1.weight"].T)


def test_loader_async_matches_sync_and_prefetches():
    """The threaded prefetch loader must yield byte-identical batches to
    the synchronous path (per-sample RNG is (seed, step, slot)-derived,
    so worker scheduling cannot change augmentations)."""
    import itertools
    datasets = [SyntheticDetDataset(n=8, img_size=64,
                                    box_type="hbb" if i == 0 else "obb",
                                    seed=i) for i in range(3)]
    pipes = [PipelineCfg(img_size=64, max_gt=6)] * 3
    sync = TriSourceLoader(datasets, [2, 1, 1], pipes, seed=3,
                           num_workers=0)
    asyn = TriSourceLoader(datasets, [2, 1, 1], pipes, seed=3,
                           num_workers=4, prefetch=2)
    for b_s, b_a in itertools.islice(zip(iter(sync), iter(asyn)), 3):
        for mod in MODALITIES:
            for k in b_s[mod]:
                np.testing.assert_array_equal(b_s[mod][k], b_a[mod][k])


def _corner_set_close(p1, p2, atol=1e-3):
    """Compare two (N, 8) corner arrays as unordered point sets."""
    c1 = p1.reshape(-1, 4, 2)
    c2 = p2.reshape(-1, 4, 2)
    d = np.linalg.norm(c1[:, :, None] - c2[:, None, :], axis=-1)
    # every corner of c1 must have a close partner in c2 and vice versa
    return (d.min(2) < atol).all() and (d.min(1) < atol).all()


def test_flip_obbs_geometric_all_directions_and_versions():
    """Flipped OBB corners == mirrored original corners, for every
    direction x angle version (reference RRandomFlip.bbox_flip,
    mmrotate/datasets/pipelines/transforms.py:200-232)."""
    from sm3det_tpu.ops.box_convert import obb2poly_np
    H, W = 64, 96
    rng = np.random.RandomState(3)
    for version, lo, hi in (("oc", 0.05, np.pi / 2 - 0.05),
                            ("le135", -np.pi / 4 + 0.05,
                             3 * np.pi / 4 - 0.05),
                            ("le90", -np.pi / 2 + 0.05,
                             np.pi / 2 - 0.05)):
        n = 16
        obbs = np.stack([rng.uniform(10, W - 10, n),
                         rng.uniform(10, H - 10, n),
                         rng.uniform(4, 12, n), rng.uniform(2, 8, n),
                         rng.uniform(lo, hi, n)], -1).astype(np.float32)
        if version != "oc":
            # long-edge conventions keep w >= h
            obbs[:, 2], obbs[:, 3] = (np.maximum(obbs[:, 2], obbs[:, 3]),
                                      np.minimum(obbs[:, 2], obbs[:, 3]))
        ref = obb2poly_np(obbs, version)
        for direction in ("horizontal", "vertical", "diagonal"):
            mirrored = ref.copy()
            if direction in ("horizontal", "diagonal"):
                mirrored[:, 0::2] = W - ref[:, 0::2]
            if direction in ("vertical", "diagonal"):
                mirrored[:, 1::2] = H - ref[:, 1::2]
            out = T.flip_obbs(obbs, (H, W), direction, version)
            got = obb2poly_np(out, version)
            assert _corner_set_close(got, mirrored), \
                (version, direction)


def test_rbbox_flip_matches_numpy_flip():
    """Device-side rbbox_flip (ops/box_convert.py) agrees with the
    host-side pipeline flip for every direction/version."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sm3det_tpu.ops.box_convert import rbbox_flip, obb2poly_np
    H, W = 48, 80
    rng = np.random.RandomState(5)
    obbs = np.stack([rng.uniform(10, W - 10, 8),
                     rng.uniform(10, H - 10, 8),
                     rng.uniform(6, 12, 8), rng.uniform(2, 5, 8),
                     rng.uniform(-1.2, 1.2, 8)], -1).astype(np.float32)
    for version in ("le90", "le135", "oc"):
        ob = obbs.copy()
        if version == "oc":
            ob[:, 4] = np.abs(ob[:, 4]) % (np.pi / 2)
        for direction in ("horizontal", "vertical", "diagonal"):
            a = np.asarray(rbbox_flip(jnp.asarray(ob), (H, W),
                                      direction, version))
            b = T.flip_obbs(ob, (H, W), direction, version)
            assert _corner_set_close(obb2poly_np(a, version),
                                     obb2poly_np(b, version)), \
                (version, direction)


def test_flip_direction_ratios():
    """List-form flip_ratio picks each direction with its own ratio and
    leaves 1 - sum unflipped."""
    rng = np.random.RandomState(0)
    img = np.zeros((8, 8, 3), np.float32)
    counts = {"horizontal": 0, "vertical": 0, "diagonal": 0, False: 0}
    for _ in range(4000):
        _, _, _, picked = T.random_flip(
            rng, img, None, None, prob=[0.25, 0.25, 0.25],
            direction=["horizontal", "vertical", "diagonal"])
        counts[picked] += 1
    for k in counts:
        assert abs(counts[k] / 4000 - 0.25) < 0.04, counts


def test_pipeline_cfg_from_config_matches_reference_flags():
    """The _base_/soi_det.py pipeline section carries the reference's
    augmentation flags (configs/_base_/datasets/SOI_Det.py:40-52)."""
    import os
    from sm3det_tpu.utils.config import Config
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = Config.fromfile(os.path.join(root, "sm3det_convnext_t.py"))
    rgb = PipelineCfg.from_config(cfg.data["rgb"], img_size=cfg.img_size,
                                  version=cfg.angle_version)
    assert rgb.rotate_ratio == 0.5
    assert rgb.angles_range == 180
    assert tuple(rgb.rect_classes) == (0, 1, 2, 3, 4, 5, 16, 18)
    assert tuple(rgb.flip_directions) == ("horizontal", "vertical",
                                          "diagonal")
    assert list(rgb.flip_prob) == [0.25, 0.25, 0.25]
    sar = PipelineCfg.from_config(cfg.data["sar"], img_size=cfg.img_size,
                                  version=cfg.angle_version)
    assert sar.flip_prob == 0.5
    assert tuple(sar.flip_directions) == ("horizontal",)
    assert sar.rotate_ratio == 0.0
    # and the full train pipeline runs with those flags
    ds = SyntheticDetDataset(n=2, img_size=100, box_type="obb", seed=0)
    rng = np.random.RandomState(1)
    out = run_pipeline(rng, ds.get_raw(0), rgb, train=True)
    assert out["img"].shape == (800, 800, 3)
    assert out["gt_obbs"].shape[1] == 5


def test_build_dataset_wrappers_from_config():
    """Concat/Repeat/ClassBalanced wrappers are constructible from a
    config dict (mmrotate/datasets/builder.py:36-60 parity), including
    nesting, and compose with the loader protocol."""
    from sm3det_tpu.data.datasets import build_dataset
    leaf = dict(type="SyntheticDetDataset", n=6, img_size=32,
                num_classes=3, box_type="obb", seed=0)
    cfg = dict(type="ConcatDataset", datasets=[
        dict(type="RepeatDataset", times=3, dataset=dict(leaf)),
        dict(type="ClassBalancedDataset", oversample_thr=0.5,
             dataset=dict(leaf)),
    ])
    ds = build_dataset(cfg)
    assert len(ds) >= 6 * 3 + 6
    raw = ds.get_raw(len(ds) - 1)
    assert raw["img"].shape == (32, 32, 3)
    # pipeline/max_gt keys are loader config, stripped by the builder
    cfg2 = dict(leaf, max_gt=9, pipeline=dict(flip_ratio=0.5))
    assert len(build_dataset(cfg2)) == 6
    # leaf with missing paths falls back to synthetic when allowed
    miss = dict(type="DOTADataset", ann_folder="/nonexistent/a",
                img_folder="/nonexistent/b")
    fb = dict(n=4, img_size=32, num_classes=3, box_type="obb", seed=1)
    assert len(build_dataset(miss, synthetic_fallback=fb)) == 4
    import pytest
    with pytest.raises(FileNotFoundError):
        build_dataset(miss)
