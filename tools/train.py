#!/usr/bin/env python
"""Training CLI (parity with ``tools/train.py``: config, --work-dir,
--resume-from, --auto-resume, --cfg-options, --seed, --max-iters)."""

from __future__ import annotations

import argparse
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("SM3DET_CPU"):
    # SM3DET_CPU=N (N>1) provisions N virtual CPU devices for mesh smoke
    # runs; SM3DET_CPU=1 is plain single-device CPU.
    _n = os.environ["SM3DET_CPU"]
    if _n.isdigit() and int(_n) > 1:
        _f = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in _f:
            os.environ["XLA_FLAGS"] = (
                _f + f" --xla_force_host_platform_device_count={_n}"
            ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config")
    p.add_argument("--work-dir")
    p.add_argument("--resume-from")
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--deterministic", action="store_true",
                   help="bitwise-reproducible runs (reference "
                        "tools/train.py --deterministic -> cudnn "
                        "determinism; on TPU/XLA compiled graphs are "
                        "already deterministic for a fixed seed — this "
                        "pins the remaining source, matmul precision)")
    p.add_argument("--max-iters", type=int, default=None,
                   help="override max_iters (smoke runs)")
    p.add_argument("--synthetic-data", action="store_true",
                   help="force synthetic fixtures instead of real data")
    p.add_argument("--allow-synthetic", action="store_true",
                   help="permit silent synthetic fallback when a real "
                        "data root is missing (otherwise a missing root "
                        "in a non---synthetic-data run aborts)")
    p.add_argument("--num-devices", type=int, default=None,
                   help="use the first N local devices (default: all)")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def init_distributed():
    """Multi-host SPMD init (replaces init_dist/NCCL,
    mmcv/mmcv/runner/dist_utils.py:37): env-gated so single-host runs
    need nothing. Set SM3DET_DIST=1 (or JAX coordinator env vars /
    tools/dist_train.sh) to enable ``jax.distributed.initialize``."""
    import jax
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        if os.environ.get("SM3DET_CPU"):
            # CPU multi-process collectives go through gloo (must be set
            # before the backend initializes, so key off the env flag)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ.get("NPROC", "1")),
            process_id=int(os.environ.get("PROC_ID", "0")))
    elif os.environ.get("SM3DET_DIST"):
        try:
            jax.distributed.initialize()  # auto-detect (TPU pod metadata)
        except Exception as e:  # single process, no pod metadata
            print(f"jax.distributed auto-init unavailable "
                  f"({type(e).__name__}); single-process run")
            return
    else:
        return
    print(f"jax.distributed: process {jax.process_index()}/"
          f"{jax.process_count()}, "
          f"{jax.local_device_count()} local devices")
    if jax.process_count() > 1:
        # prime the cross-process collective context NOW, while the
        # processes are still in lockstep from the initialize()
        # rendezvous: gloo context creation has a hard 30 s key-value
        # timeout, and deferring it to the first training collective
        # (after minutes of potentially skewed per-process compile)
        # makes that timeout flaky on shared CPUs
        from jax.experimental.multihost_utils import sync_global_devices
        sync_global_devices("sm3det_collective_prime")
        print("collective context primed")


def build_datasets(cfg, synthetic: bool, seed_offset: int = 0,
                   split: str = "train", allow_synthetic: bool = True):
    """seed_offset > 0 builds held-out synthetic val splits (different
    draws from the same distribution). ``split='val'`` reads
    ``cfg.data.val[key]`` when configured (reference EvalHooks evaluate
    the val split, ``mmrotate/apis/train.py:100-166``), falling back to
    the train section per modality. ``allow_synthetic=False`` aborts a
    real-data run whose data roots are missing instead of silently
    evaluating synthetic fixtures."""
    from sm3det_tpu.data.datasets import SyntheticDetDataset, build_dataset
    section = cfg.data
    if split == "val" and cfg.data.get("val") is not None:
        section = cfg.data.val
    out = []
    for i0, key in enumerate(("sar", "rgb", "ifr")):
        i = i0 + seed_offset
        dcfg = section[key] if section.get(key) is not None \
            else cfg.data[key]
        dcfg = dcfg.to_dict()
        dtype = dcfg.get("type")
        box_type = "hbb" if key == "sar" else "obb"
        fallback = dict(n=64, img_size=cfg.img_size,
                        num_classes=cfg.num_classes,
                        box_type=box_type, seed=i)
        if dtype == "StructuredSyntheticDetDataset":
            for k, v in (("img_size", cfg.img_size),
                         ("num_classes", cfg.num_classes),
                         ("box_type", box_type), ("seed", i)):
                dcfg.setdefault(k, v)
            ds = build_dataset(dcfg, version=cfg.angle_version)
        elif synthetic:
            ds = SyntheticDetDataset(**fallback)
        else:
            # recursive builder: handles Concat/Repeat/ClassBalanced
            # wrappers (mmrotate/datasets/builder.py:36) and falls back
            # to synthetic fixtures when data roots are absent
            ds = build_dataset(dcfg, version=cfg.angle_version,
                               synthetic_fallback=fallback)
            if isinstance(ds, SyntheticDetDataset) and \
                    dtype != "SyntheticDetDataset":
                msg = (f"data root(s) missing for {split}/{key} "
                       f"({dtype}); this run would silently train/eval "
                       f"on SYNTHETIC fixtures")
                if not allow_synthetic:
                    raise SystemExit(
                        msg + " — pass --synthetic-data or "
                              "--allow-synthetic to permit this")
                print(f"WARNING: {msg} (--allow-synthetic given)",
                      flush=True)
        out.append(ds)
    return out


def main():
    args = parse_args()
    from sm3det_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_cli_options(args.cfg_options))
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dirs/run")
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, "config.py"))

    import jax
    import numpy as np
    from sm3det_tpu.data.loader import PipelineCfg, TriSourceLoader
    from sm3det_tpu.models.detectors.trisource import TriSourceDetector
    from sm3det_tpu.train.checkpoint import (find_latest_checkpoint,
                                             load_checkpoint,
                                             convnext_torch_to_jax,
                                             load_torch_state_dict)
    from sm3det_tpu.train.dla import make_dla_config
    from sm3det_tpu.train.loop import run_training
    from sm3det_tpu.train.optim import make_optimizer
    from sm3det_tpu.train.train_state import (TrainState, build_train_step,
                                              init_trisource)

    seed = args.seed if args.seed is not None else cfg.get("seed", 0)
    if args.deterministic:
        # fixed-seed XLA graphs are deterministic; pin the one knob that
        # can vary numerics across runs/platform defaults
        jax.config.update("jax_default_matmul_precision", "highest")
    from sm3det_tpu.models import normalize_model_cfg
    model_cfg = normalize_model_cfg(cfg.model.to_dict())
    model_type = model_cfg.pop("type", "TriSourceDetector")
    pretrained = model_cfg["backbone"].pop("pretrained", None)
    if "moe_block_inds" in model_cfg["backbone"]:
        model_cfg["backbone"]["moe_block_inds"] = tuple(
            tuple(x) for x in model_cfg["backbone"]["moe_block_inds"])
    if model_type == "TriSourceDetector":
        model = TriSourceDetector(cfg=model_cfg)
    else:
        # TriSource variants via the registry (H1R1/H2R1/H2R2 share the
        # same batch/loss contract)
        from sm3det_tpu.models import DETECTORS
        cls = DETECTORS.get(model_type)
        from sm3det_tpu.models.detectors.trisource_variants import \
            TriSourceVariant
        if cls is TriSourceVariant or model_type == "TriSourceVariant":
            model = TriSourceVariant(
                cfg=model_cfg,
                sar_stages=cfg.model.get("sar_stages", 1),
                rot_stages=cfg.model.get("rot_stages", 1))
        else:
            raise SystemExit(
                f"tools/train.py drives the TriSource family; use the "
                f"library API for single-dataset detector {model_type!r}")

    # --- SPMD setup: DP x EP mesh over all addressable devices ---
    init_distributed()
    n_dev = args.num_devices or jax.device_count()
    ep = int(cfg.get("expert_parallel", 1))
    if n_dev % max(ep, 1) != 0:
        raise SystemExit(f"expert_parallel={ep} must divide "
                         f"device count {n_dev}")
    dp = n_dev // ep  # data-parallel replicas (batch composition scaling)
    mesh = None
    if n_dev > 1:
        from sm3det_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_dev, expert_parallel=ep)
        print(f"mesh: {n_dev} devices = {dp} data x {ep} expert")

    datasets = build_datasets(cfg, args.synthetic_data,
                              allow_synthetic=args.allow_synthetic)
    base_ratio = list(cfg.source_ratio)
    ratio = [r * dp for r in base_ratio]  # global per-step composition
    pipes = [PipelineCfg.from_config(
                 cfg.data[k], img_size=cfg.img_size,
                 version=cfg.angle_version,
                 max_gt=cfg.data[k].get("max_gt", 256))
             for k in ("sar", "rgb", "ifr")]
    # each host loads only its share of the global batch
    dp_local = max(dp // jax.process_count(), 1)
    loader = TriSourceLoader(datasets, base_ratio, pipes,
                             batches_per_step=dp_local, seed=seed,
                             host_id=jax.process_index(),
                             num_hosts=jax.process_count())
    data_iter = iter(loader)

    sample_batch = next(data_iter)
    init_batch = sample_batch
    if jax.process_count() > 1:
        # params are traced against the GLOBAL batch composition; each
        # host's loader yields only its local share, so tile it up
        init_batch = jax.tree.map(
            lambda x: np.concatenate([x] * jax.process_count()),
            sample_batch)
    params = init_trisource(
        jax.random.PRNGKey(seed), model, init_batch,
        source_ratio=tuple(ratio))

    if pretrained and os.path.exists(pretrained):
        sd = load_torch_state_dict(pretrained)
        params = convnext_torch_to_jax(
            sd, params, num_experts=model_cfg["backbone"]["num_experts"])
        print(f"loaded pretrained backbone from {pretrained}")

    lr_cfg = cfg.lr_config
    extra = lr_cfg.extra_args
    if lr_cfg.get("policy") == "dynamic":
        from sm3det_tpu.train.dla import reweight_for_variant
        reweight = reweight_for_variant(
            cfg.model.get("sar_stages", 1),
            cfg.model.get("rot_stages", 2)) \
            if model_type == "TriSourceVariant" else None
        kw = dict(reweight=reweight) if reweight else {}
        dla_cfg = make_dla_config(
            T=extra.get("T", 3.0), b=extra.get("b", 0.4),
            ema_beta=extra.get("ema", 0.001),
            backbone_policy=extra.get("backbone_policy", "sigmoid_kl"),
            head_policy=extra.get("head_policy", "normal"),
            warmup_iters=lr_cfg.get("warmup_iters", 500), **kw)
    else:
        dla_cfg = None
    layer_decay = cfg.optimizer.get("layer_decay")
    if layer_decay is not None and hasattr(layer_decay, "to_dict"):
        layer_decay = layer_decay.to_dict()
    max_iters = args.max_iters or cfg.get("max_iters", 1000)
    init_fn, update_fn, _ = make_optimizer(
        base_lr=cfg.optimizer.lr,
        weight_decay=cfg.optimizer.get("weight_decay", 0.0),
        betas=tuple(cfg.optimizer.get("betas", (0.9, 0.999))),
        grad_clip=(lambda gc: gc.get("max_norm") if hasattr(gc, "get")
                   else gc)(cfg.optimizer.get("grad_clip")),
        step_iters=tuple(lr_cfg.get("step", [])),
        warmup_iters=lr_cfg.get("warmup_iters", 500),
        warmup_ratio=lr_cfg.get("warmup_ratio", 1.0 / 3),
        dla_cfg=dla_cfg,
        accumulate=int(cfg.optimizer.get("accumulate", 1)),
        layer_decay=layer_decay,
        # LR-updater zoo: step/cosine/poly/exp/inv/fixed
        # (mmcv lr_updater.py; 'dynamic' = DLA over step)
        lr_policy=lr_cfg.get("policy", "step"),
        warmup=lr_cfg.get("warmup", "linear"),
        min_lr=lr_cfg.get("min_lr"),
        min_lr_ratio=lr_cfg.get("min_lr_ratio"),
        power=lr_cfg.get("power", 1.0),
        gamma=lr_cfg.get("gamma", 0.1),
        max_iters=max_iters)

    ema_decay = float(cfg.get("ema_decay", 0.0))
    reweight_mode = cfg.model.get("multi_tasks_reweight")
    prev_losses = None
    if reweight_mode == "dwa":
        import jax.numpy as jnp
        from sm3det_tpu.models.detectors.trisource import REWEIGHT_LOSS_KEYS
        prev_losses = jnp.zeros(len(REWEIGHT_LOSS_KEYS))
    state = TrainState(params=params, opt=init_fn(params),
                       rng=jax.random.PRNGKey(seed + 1),
                       prev_losses=prev_losses,
                       ema=params if ema_decay else None)
    start_iter = 0
    resume = args.resume_from or (
        find_latest_checkpoint(work_dir) if args.auto_resume else None)
    if resume:
        state = load_checkpoint(resume, state)
        start_iter = int(state.opt.step)
        print(f"resumed from {resume} at iter {start_iter}")

    step = build_train_step(model, init_fn, update_fn,
                            source_ratio=tuple(ratio),
                            multi_tasks_reweight=reweight_mode,
                            ema_decay=ema_decay)
    device_put = None
    if mesh is not None:
        from sm3det_tpu.train.train_state import shard_train_step
        jstep, state, device_put = shard_train_step(
            step, mesh, state, sample_batch,
            zero1=bool(cfg.get("zero1_optimizer_sharding", False)))
    else:
        jstep = jax.jit(step, donate_argnums=(0,))

    if jax.process_count() > 1:
        # compile BEFORE the first dispatch and rendezvous on the
        # startup-primed context: gloo creates each collective context
        # lazily at first dispatch with a hard 30 s key-value timeout,
        # so per-rank compile skew (minutes on a contended host when
        # the persistent cache misses) must be absorbed here, not there
        from jax.experimental.multihost_utils import sync_global_devices
        t0 = time.perf_counter()
        jstep.lower(state, device_put(sample_batch) if device_put
                    else sample_batch).compile()
        print(f"train step compiled in {time.perf_counter() - t0:.1f}s;"
              " waiting for peers")
        sync_global_devices("sm3det_train_step_compiled")

    # multi-val evaluation (the reference registers one EvalHook per
    # modality over cfg.data.val, mmrotate/apis/train.py:100-166); the
    # streaming uint8 loop is shared with tools/test.py
    # (apis/eval_loop.py) so memory stays O(batch) at full-val scale
    eval_fns = None
    eval_interval = None
    if cfg.get("evaluation") is not None:
        from sm3det_tpu.apis.eval_loop import (make_uint8_test_fn,
                                               stream_eval)
        from sm3det_tpu.core.evaluation.eval_map import eval_rbbox_map

        eval_interval = cfg.evaluation.get("interval")
        # num_images=None (or <=0) means the WHOLE val set per eval pass
        # (reference behavior: EvalHook evaluates the full val split)
        n_eval = cfg.evaluation.get("num_images", 16)
        n_eval = int(n_eval) if n_eval else 0
        val_sets = build_datasets(
            cfg, args.synthetic_data,
            seed_offset=int(cfg.evaluation.get("seed_offset", 0)),
            split="val", allow_synthetic=args.allow_synthetic)
        scale_ranges = cfg.evaluation.get("scale_ranges")

        def make_eval(sub, ds, pipe):
            method = {"sar": "simple_test_sar", "rgb": "simple_test_rgb",
                      "ifr": "simple_test_ifr"}[sub]
            tfn = make_uint8_test_fn(model, method, cfg.img_size,
                                     pipe.mean, pipe.std)
            box_dim = 4 if sub == "sar" else 5
            eval_bs = int(cfg.evaluation.get("batch_size", 8))
            eval_workers = int(cfg.evaluation.get("num_workers", 4))

            def run(state):
                from sm3det_tpu.parallel.collect import (
                    collect_results_cpu, shard_indices)
                n = min(n_eval, len(ds)) if n_eval > 0 else len(ds)
                # multi-process: each process evaluates its stride of the
                # val set; results gathered below (collect_results parity,
                # mmcv/mmcv/engine/test.py:97-164)
                my_idx = shard_indices(n)
                params = state.params
                if jax.process_count() > 1:
                    # fully-replicated global arrays -> host copy usable
                    # with the local-device eval jit
                    params = jax.device_get(params)
                dets, anns, _ = stream_eval(
                    tfn, {"params": params}, ds, cfg.img_size, pipe.mean,
                    num_classes=cfg.num_classes, box_dim=box_dim,
                    gt_key="hbbs" if sub == "sar" else "obbs",
                    batch_size=eval_bs, indices=my_idx,
                    num_workers=eval_workers)
                gathered = collect_results_cpu(list(zip(dets, anns)), n)
                if gathered is None:    # non-zero rank
                    return None
                # metric contract per modality (main_SM3Det.py:286-288):
                # SAR evaluates with the COCO bbox protocol
                # (CocoDataset.evaluate('bbox')), RGB/IFR with
                # VOC-style eval_rbbox_map ('mAP')
                metric = cfg.evaluation.get("metric") or (
                    "bbox" if sub == "sar" else "mAP")
                if metric == "bbox":
                    from sm3det_tpu.core.evaluation.coco_eval import (
                        coco_eval_bbox)
                    return coco_eval_bbox(
                        [g[0] for g in gathered],
                        [g[1] for g in gathered], logger=None)
                return eval_rbbox_map([g[0] for g in gathered],
                                      [g[1] for g in gathered],
                                      box_dim=box_dim,
                                      scale_ranges=scale_ranges,
                                      logger=None)

            return run

        eval_fns = {
            sub: make_eval(sub, val_sets[i], pipes[i])
            for i, sub in enumerate(("sar", "rgb", "ifr"))}

    run_training(
        jstep, state, data_iter, max_iters, work_dir,
        device_put=device_put,
        log_interval=cfg.get("log_interval", 50),
        checkpoint_interval=cfg.get("checkpoint_interval"),
        eval_fns=eval_fns, eval_interval=eval_interval,
        start_iter=start_iter)


if __name__ == "__main__":
    main()
