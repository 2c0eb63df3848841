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
