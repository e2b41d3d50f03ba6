"""CLI subcommand implementations."""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from pathlib import Path

import numpy as np


def _flow_cfgs(config: dict):
    from ..losses import make_loss
    from ..training import TrajectoryNetConfig

    mc, lc = config["model"], config["loss"]
    cfg = TrajectoryNetConfig(
        image_shape=tuple(mc["image_shape"]), lr=mc["lr"],
        num_bins=mc["num_bins"], num_basis=mc["num_basis"],
        patch_size=mc["patch_size"], model_type=mc.get("model_type", "default"),
        basis_type=mc["basis_type"], skip_frames=mc.get("skip_frames", 1),
        # `model.compute_dtype: bfloat16` is the measured production point
        # (bf16 convs on the MXU, f32 params/BN stats/loss — see bench.py);
        # float32 default for reference parity.
        compute_dtype=mc.get("compute_dtype", "float32"))
    loss_cfg = make_loss(lc["loss_name"], image_shape=tuple(lc["image_shape"]),
                         **{k: v for k, v in lc.items()
                            if k not in ("loss_name", "image_shape")})
    return cfg, loss_cfg


def cmd_flow_train(args) -> int:
    """Self-supervised DSEC flow training (reference scripts/flow_training.py)."""
    from ..config import load_yaml, propagate_config
    from ..data import DsecDatasetProvider
    from ..data.loader import DataLoader
    from ..training.checkpoint import restore_checkpoint
    from ..training.loop import train_flow
    from ..training import create_train_state
    import jax

    import math

    from ..parallel import make_mesh
    from ..parallel.distributed import initialize_distributed

    # Multi-host: every process runs this same command with its own
    # --process-id; must happen before any jax.devices() query (the reference
    # analog is Lightning's DDP spawn, scripts/flow_training.py:125-130).
    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    config = propagate_config(load_yaml(args.config))
    cfg, loss_cfg = _flow_cfgs(config)
    dc = config["data"]
    pab = dc.get("polarity_aware_batching", False)

    # Mesh: the data axis must divide the batch (XLA even-sharding).  Default
    # = gcd(batch, n_devices); --mesh data,event overrides (event > 1 shards
    # the event capacity — the beyond-reference axis, SURVEY.md §5.7).
    if args.mesh:
        mesh = make_mesh(data=args.mesh[0], event=args.mesh[1])
    else:
        import jax as _jax

        mesh = make_mesh(
            data=math.gcd(dc["batch_size"], len(_jax.devices())), event=1)

    capacity = args.event_capacity
    pos_capacity = capacity // 2 if pab else None
    buckets = args.event_capacity_buckets
    if n_proc > 1:
        # Global batch assembly needs one static capacity across hosts.
        assert buckets is None, "--event-capacity-buckets is single-host only"
        assert dc["batch_size"] % n_proc == 0, (dc["batch_size"], n_proc)

    def make_loader(split, shuffle):
        provider = DsecDatasetProvider(
            dc["data_path"], split=split, num_bins=dc["num_bins"],
            polarity_aware_batching=pab,
            # Host voxelize (C++ in the loader threads, overlapped) by
            # default: the on-device XLA scatter costs 785 ms at b8 x 1M —
            # 3.5x the rest of the step (ROADMAP round-4 log).
            host_voxelize=not args.device_voxelize,
            voxel_norm_type=dc.get("norm_type", "mean_std"),
            voxel_quantile=dc.get("quantile", 0.0))
        return DataLoader(provider, batch_size=dc["batch_size"] // n_proc,
                          capacity=capacity, shuffle=shuffle,
                          num_workers=dc.get("num_workers", 8),
                          polarity_aware=pab, pos_capacity=pos_capacity,
                          capacity_buckets=buckets,
                          shard=(jax.process_index(), n_proc)
                          if n_proc > 1 else None,
                          # Cell-sorted events + boundaries: the focus-loss
                          # gather backward runs the O(M) sorted segment sum
                          # (host_ops.lut_cell_sort; ~10x the matmul path).
                          lut_cell_sort_params=(
                              loss_cfg.image_shape, loss_cfg.num_bins,
                              loss_cfg.lut_superpixel_size))

    train_loader = make_loader("train", True)
    val_loader = make_loader("val", False)

    resume_state = None
    if args.ckp_path:
        template = create_train_state(cfg, jax.random.PRNGKey(0))
        resume_state, step = restore_checkpoint(args.ckp_path, template)
        if is_main:
            print(f"resumed from {args.ckp_path} @ step {step}")

    workdir = args.workdir or f"runs/flow_{datetime.now():%Y%m%d_%H%M%S}"
    # Image panel logging is unconditional, as in the reference
    # (scripts/flow_training.py:118-120 registers DsecImageLoggingCallback
    # over 5 evenly-spaced val samples; src/utils/logging.py:33-47).
    out = train_flow(cfg, loss_cfg, train_loader, val_loader, workdir,
                     max_epochs=config.get("trainer", {}).get("max_epochs", 100),
                     num_pos_events=pos_capacity if pab else -1,
                     resume_state=resume_state, log_every=args.log_every,
                     mesh=mesh,
                     image_log_dataset=val_loader.dataset,
                     image_log_collate=val_loader.collate_fn)
    if is_main:
        print(f"done: best={out['best']:.4f} steps={out['steps']}")
    return 0


def cmd_dsec_infer(args) -> int:
    """DSEC benchmark-submission inference (reference scripts/dsec_inference.py).

    Loads bare UNet weights (torch .pth via the converter, or our .npz /
    orbax), runs the 7 test sequences from the timestamp CSVs, writes 16-bit
    PNGs with the 60 px magnitude cap.
    """
    import jax
    import jax.numpy as jnp

    from ..config import load_yaml, propagate_config
    from ..data import DsecSequence
    from ..training import TrajectoryNetConfig, predict_flow
    from ..training.trajectory_net import TrainState, create_train_state
    from ..training.checkpoint import (extract_model_weights,
                                       restore_checkpoint,
                                       torch_unet_to_flax,
                                       unflatten_model_weights)
    from ..utils import save_flow_png, scale_optical_flow

    config = propagate_config(load_yaml(args.config))
    cfg, _ = _flow_cfgs({**config, "loss": config.get("loss", {
        "loss_name": "FOCUS", "image_shape": config["model"]["image_shape"]})})

    # Checkpoint sources, closing the train->submit loop (reference §3.1+§3.4:
    # its own training artifact -> extract_weights -> dsec_inference,
    # scripts/extract_weights_from_checkpoint.py:7-22 + dsec_inference.py:51-55):
    #   * torch .pth/.ckpt  — published reference weights via the converter
    #   * orbax dir         — this framework's flow-train output (best-metric
    #                         retained checkpoint when metrics were recorded,
    #                         else latest; --ckpt-step overrides)
    #   * .npz              — `extract-weights` output, either layout
    ckpt_path = config["model"]["ckpt_path"]
    params = stats = None
    if str(ckpt_path).endswith((".pth", ".ckpt")):
        params, stats = torch_unet_to_flax(extract_model_weights(ckpt_path))
        params = {"unet": params}
        stats = {"unet": stats}
    elif str(ckpt_path).endswith(".npz"):
        flat = dict(np.load(ckpt_path))
        if all(k.split("/")[0] in ("params", "batch_stats") for k in flat):
            params, stats = unflatten_model_weights(flat)
        else:  # torch-key layout (extract-weights from a Lightning ckpt)
            params, stats = torch_unet_to_flax(flat)
            params = {"unet": params}
            stats = {"unet": stats}
    elif Path(str(ckpt_path)).is_dir():
        template = create_train_state(cfg, jax.random.PRNGKey(0))
        state, step = restore_checkpoint(
            str(ckpt_path), template, step=args.ckpt_step, best=True)
        print(f"restored orbax checkpoint @ step {step}")
        params, stats = state.params, state.batch_stats
    else:
        raise SystemExit(
            f"dsec-infer: {ckpt_path!r} is not a .pth/.ckpt, .npz, or an "
            "orbax checkpoint directory")

    import optax

    state = TrainState.create(apply_fn=None, params=params,
                              tx=optax.identity(), batch_stats=stats)

    timestamp_dir = Path(args.timestamp_dir)
    test_seqs = sorted(p.stem for p in timestamp_dir.glob("*.csv"))
    dataset_dir = Path(config["data"]["root_dir"]) / "test"
    run_out = Path(config["output_dir"]) / f"{datetime.now():%Y%m%d_%H%M%S}"

    predict = jax.jit(lambda s, v: predict_flow(s, v, cfg))

    for seq_name in test_seqs:
        seq = DsecSequence(dataset_dir / seq_name, "test",
                           config["common"]["num_bins"],
                           timestamp_path=str(timestamp_dir / f"{seq_name}.csv"))
        out_dir = run_out / "flow" / seq_name
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in range(len(seq)):
            sample = seq[i]
            # Voxelize on device from the raw events (TPU-first; the CPU
            # voxel twin exists for parity tests).
            from ..ops.events import voxel_grid_from_events, normalize_voxel_grid

            ev = sample["events"]
            voxel = voxel_grid_from_events(
                jnp.asarray(ev[:, 0]), jnp.asarray(ev[:, 1]),
                jnp.asarray(ev[:, 2] * (cfg.num_bins - 1)),
                jnp.asarray(ev[:, 3]), jnp.ones(len(ev)),
                num_bins=cfg.num_bins, height=cfg.image_shape[0],
                width=cfg.image_shape[1])
            voxel = normalize_voxel_grid(
                voxel, config["data"].get("norm_type", "mean_std"))
            flow = np.asarray(predict(state, voxel[None]))[0]
            flow = scale_optical_flow(flow, 60)
            fname = f"{str(int(sample['file_index'])).zfill(6)}.png"
            save_flow_png(out_dir / fname, flow)
        print(f"{seq_name}: {len(seq)} flow maps -> {out_dir}")
    print("Done.")
    return 0


def _stack_traj_batch(samples, use_boundary_images: bool):
    """Collate provider samples into a trajectory-validation batch."""
    import jax.numpy as jnp

    batch = {
        "ev_repr": jnp.asarray(np.stack([s["ev_repr"] for s in samples])),
        "flow": jnp.asarray(np.stack([s["flow"] for s in samples])),
    }
    if "flow_valid" in samples[0]:
        batch["flow_valid"] = jnp.asarray(
            np.stack([s["flow_valid"] for s in samples]))
    if use_boundary_images and "img" in samples[0]:
        batch["img"] = [
            jnp.asarray(np.stack([s["img"][j] for s in samples]))
            for j in range(2)]
    return batch


def _run_traj_validation(val_step, state, provider, bsz: int,
                         use_boundary_images: bool) -> dict:
    """One full validation pass -> computed metric dict.

    Metric (sum, count) states accumulate ON DEVICE (MetricBank.update_device)
    — one host transfer for the whole bank instead of one sync per metric per
    batch (the tunneled-TPU transfer tax)."""
    from ..metrics import MetricBank

    bank = MetricBank()
    n = len(provider)
    bsz = min(bsz, n)
    for i0 in range(0, n - n % bsz, bsz):
        samples = [provider[i] for i in range(i0, i0 + bsz)]
        bank.update_device(
            val_step(state, _stack_traj_batch(samples, use_boundary_images)))
    return bank.compute()


def cmd_traj_val(args) -> int:
    """Trajectory validation on EVIMO2 (reference scripts/trajectory_inference.py)."""
    import jax

    from ..config import compose
    from ..data.evimo2 import Evimo2Provider
    from ..metrics import MetricBank
    from ..models.raft_spline import RAFTSplineConfig
    from ..training.raft_spline import (RAFTTrainConfig, create_raft_state,
                                        raft_validation_step)
    import functools
    import jax.numpy as jnp

    cfg_tree = compose(args.config_dir, args.config_name, args.overrides)
    mc = cfg_tree["model"]
    cfg = RAFTSplineConfig(
        nbins_context=mc["num_bins"]["context"],
        nbins_correlation=mc["num_bins"]["correlation"],
        bezier_degree=mc["bezier_degree"], curve_type=mc["curve_type"],
        detach_bezier=mc.get("detach_bezier", False),
        use_events=mc.get("use_events", True),
        use_boundary_images=mc.get("use_boundary_images", False),
        ev_target_indices=tuple(mc["correlation"]["ev"]["target_indices"]),
        ev_levels=tuple(mc["correlation"]["ev"]["levels"]),
        iters=mc["num_iter"]["test"],
        corr_dtype=mc.get("corr_dtype", "float32"),
        compute_dtype=mc.get("compute_dtype", "float32"))

    ds = cfg_tree["dataset"]
    dataset_name = ds.get("name", "evimo2")
    if dataset_name == "evimo2":
        provider = Evimo2Provider(
            ds["path"], nbins_context=cfg.nbins_context,
            flow_time_ms=ds["flow_time"],
            normalize_voxel_grid=ds["normalize_voxel_grid"],
            flow_every_n_ms=ds["flow_every_n_ms"])
        num_steps = int(ds["flow_time"] // ds["flow_every_n_ms"])
    elif dataset_name == "multiflow":
        from ..data.multiflow import MultiflowDatasubset

        provider = MultiflowDatasubset(
            Path(ds["path"]) / "test", num_bins_context=cfg.nbins_context,
            flow_every_n_ms=ds["flow_every_n_ms"],
            load_voxel_grid=ds.get("load_voxel_grid", True),
            extended_voxel_grid=ds.get("extended_voxel_grid", True),
            normalize_voxel_grid=ds.get("normalize_voxel_grid", True),
            prediction_time_ms=ds.get("prediction_time", 500))
        num_steps = len(provider[0]["flow_timestamps"])
    else:
        raise SystemExit(f"unknown dataset {dataset_name!r}")

    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0))
    ckpt = cfg_tree.get("checkpoint")
    if ckpt and Path(str(ckpt)).exists():
        if str(ckpt).endswith((".pth", ".ckpt")):
            # Published reference checkpoint (Lightning RAFTSplineModule,
            # model attr 'net' — src/modules/raft_spline.py:30): convert the
            # canonical RAFT/E-RAFT key layout onto the flax tree, making the
            # Tab2L5 parity run a single invocation (README 'Checkpoint
            # parity'; reference scripts/trajectory_inference.py:65-70).
            from ..training.checkpoint import (extract_model_weights,
                                               torch_raft_spline_to_flax)

            sd = extract_model_weights(str(ckpt), prefix="net.")
            variables = torch_raft_spline_to_flax(
                sd, {"params": state.params,
                     "batch_stats": state.batch_stats})
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        else:
            from ..training.checkpoint import restore_checkpoint

            state, _ = restore_checkpoint(str(ckpt), state)

    if dataset_name == "evimo2":
        ts = tuple(np.linspace(0, 1, num_steps + 1)[1:].tolist())
    else:
        ts = tuple(float(t) for t in provider[0]["flow_timestamps"])
    # Optional GT-arc-length gate on the multi metrics (reference
    # EPE_MULTI/FLOW_METRICS_MULTI min/max_traj_len options,
    # src/modules/utils.py:357-363, 496-511); dotted overrides
    # `validation.min_traj_len=...` enable it.
    vc = cfg_tree.get("validation", {}) or {}
    step = jax.jit(functools.partial(
        raft_validation_step, cfg=cfg, flow_timestamps=ts,
        min_traj_len=vc.get("min_traj_len"),
        max_traj_len=vc.get("max_traj_len")))

    results = _run_traj_validation(step, state, provider,
                                   cfg_tree.get("batch_size", 8),
                                   cfg.use_boundary_images)
    print("==========================")
    print("Validation results:")
    for key in ("val/masked_TEPE", "val/masked_TAE", "val/masked_T3PE"):
        if key in results:
            print(f"{key}: {results[key]:.4f}")
    print("==========================")
    for k in sorted(results):
        print(f"{k}: {results[k]:.5f}")
    return 0


def cmd_traj_train(args) -> int:
    """Self-supervised trajectory training (RAFT-Spline + CMax loss).

    The reference snapshot ships no trajectory trainer (its RAFTSplineModule
    is validation-only, SURVEY.md C9); this implements the 'ours-selfsup'
    experiment composition per the experiment YAML's training/loss sections.

    Data parallelism: the train step is jit-compiled over a ('data', 'event')
    mesh exactly like cmd_flow_train (default data axis = gcd(batch,
    n_devices)) — the route to the reference's batch-6 recipe as DP x
    accumulate on a pod slice.  Validation + best-k selection: every
    --val-every steps the eval split (EVIMO2 imo/eval dirs / MultiFlow test)
    runs through raft_validation_step and the monitored metric
    (val/masked_TEPE) drives best-k checkpoint retention — the reference's
    ModelCheckpoint-on-val design (scripts/flow_training.py:110-116) applied
    to the trajectory path, which shares the flow path's CMax collapse risk.
    """
    import dataclasses
    import functools
    import math

    import jax

    from ..config import compose
    from ..data.evimo2 import Evimo2Datasubset, Evimo2Provider
    from ..data.loader import DataLoader
    from ..losses import make_loss
    from ..models.raft_spline import RAFTSplineConfig
    from ..parallel import (make_mesh, make_sharded_train_step, replicate,
                            shard_batch)
    from ..parallel.distributed import initialize_distributed
    from ..training.checkpoint import save_checkpoint
    from ..training.loop import ScalarLogger, _host_local_state
    from ..training.raft_spline import (RAFTTrainConfig, create_raft_state,
                                        raft_supervised_train_step,
                                        raft_train_step,
                                        raft_validation_step)

    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    cfg_tree = compose(args.config_dir, args.config_name, args.overrides)
    mc = cfg_tree["model"]
    cfg = RAFTSplineConfig(
        nbins_context=mc["num_bins"]["context"],
        nbins_correlation=mc["num_bins"]["correlation"],
        bezier_degree=mc["bezier_degree"], curve_type=mc["curve_type"],
        detach_bezier=mc.get("detach_bezier", False),
        use_events=mc.get("use_events", True),
        use_boundary_images=mc.get("use_boundary_images", False),
        ev_target_indices=tuple(mc["correlation"]["ev"]["target_indices"]),
        ev_levels=tuple(mc["correlation"]["ev"]["levels"]),
        iters=mc["num_iter"]["train"],
        # Training-memory/throughput knobs (dotted overrides, e.g.
        # `model.corr_dtype=bfloat16`): the measured single-chip batch-6
        # recipe is corr_dtype=bfloat16 + remat_iters (ROADMAP ladder).
        freeze_bn=mc.get("freeze_bn", False),
        remat_iters=mc.get("remat_iters", True),
        remat_encoders=mc.get("remat_encoders", False),
        # `model.remat_policy=dots` + corr/compute bf16 is the measured
        # single-chip batch-6 recipe (627.9 ms/step, ROADMAP round-4 log).
        remat_policy=mc.get("remat_policy"),
        corr_dtype=mc.get("corr_dtype", "float32"),
        compute_dtype=mc.get("compute_dtype", "float32"))

    lc = dict(cfg_tree["loss"])
    pab = lc.get("polarity_aware_batching", False)

    tcfg = cfg_tree["training"]
    tc = RAFTTrainConfig(learning_rate=tcfg["learning_rate"],
                         weight_decay=tcfg["weight_decay"],
                         use_scheduler=tcfg["lr_scheduler"]["use"],
                         total_steps=args.max_steps,
                         accumulate_steps=tcfg.get("accumulate_steps", 1))

    ds = cfg_tree["dataset"]
    supervised = args.loss == "supervised"
    from pathlib import Path as _P

    if ds.get("name") == "multiflow":
        from ..data.augment import (MultiflowAugmentor, PhotometricAugmentor,
                                    SpatialAugmentor)
        from ..data.multiflow import MultiflowDatasubset

        aug = None
        if ds.get("spatial_augm") or ds.get("photo_augm"):
            aug = MultiflowAugmentor(
                spatial=(SpatialAugmentor(h_flip_prob=0.5)
                         if ds.get("spatial_augm") else None),
                photometric=(PhotometricAugmentor()
                             if ds.get("photo_augm") else None))
        dataset = MultiflowDatasubset(
            _P(ds["path"]) / "train", cfg.nbins_context,
            flow_every_n_ms=ds["flow_every_n_ms"],
            normalize_voxel_grid=ds["normalize_voxel_grid"],
            provide_raw_events=not supervised,
            polarity_aware_batching=pab and not supervised,
            prediction_time_ms=ds.get("prediction_time", 500),
            augmentor=aug)
    else:
        assert not supervised, "supervised training needs the multiflow " \
            "dataset (EVIMO2 eval GT is validation-only)"
        # Training uses the eval dirs' sibling train split when present.
        train_root = _P(ds["path"]) / "imo" / "train"
        subset_dirs = (sorted(train_root.iterdir())
                       if train_root.is_dir() else [])
        assert subset_dirs, f"no training sequences under {train_root}"
        subsets = [Evimo2Datasubset(d, cfg.nbins_context, ds["flow_time"],
                                    ds["normalize_voxel_grid"],
                                    provide_raw_events=True,
                                    polarity_aware_batching=pab,
                                    flow_every_n_ms=ds["flow_every_n_ms"])
                   for d in subset_dirs]

        class _Concat:
            def __init__(self, parts):
                self.parts = parts
                self.cum = np.cumsum([0] + [len(p) for p in parts])

            def __len__(self):
                return int(self.cum[-1])

            def __getitem__(self, i):
                si = int(np.searchsorted(self.cum, i, "right")) - 1
                return self.parts[si][i - int(self.cum[si])]

        dataset = _Concat(subsets)

    capacity = args.event_capacity
    pab = pab and not supervised
    pos_capacity = capacity // 2 if pab else None

    # Resolution comes from the data, not a hardcode: EVIMO2 resizes to
    # 384x512 (evimo2/datasubset.py:176-189), MultiFlow is 384x512 natively —
    # but a probe sample keeps this correct for any dataset variant.
    image_hw = tuple(dataset[0]["ev_repr"].shape[-2:])
    # Per-group dynamic interp band by default on the TRAJECTORY path:
    # Bezier displacements carry no 60 px protocol cap, so the flow path's
    # static band is not exactness-guaranteed here — the per-(batch, bin)
    # on-device margins are (and measure slightly faster; ROADMAP round 5).
    # Overridable via loss.interp_band_dynamic.
    lc.setdefault("interp_band_dynamic", "per_group")
    loss_cfg = make_loss(lc.pop("type", "FOCUS"), image_shape=image_hw, **lc)

    assert tcfg["batch_size"] % n_proc == 0, (tcfg["batch_size"], n_proc)
    loader = DataLoader(dataset, batch_size=tcfg["batch_size"] // n_proc,
                        capacity=capacity, polarity_aware=pab,
                        pos_capacity=pos_capacity,
                        num_workers=cfg_tree.get("hardware", {}).get("num_workers", 8),
                        shard=(jax.process_index(), n_proc)
                        if n_proc > 1 else None,
                        # Cell-sorted events -> O(M) sorted segment sum in
                        # the focus-loss gather backward (host_ops).
                        lut_cell_sort_params=None if supervised else (
                            loss_cfg.image_shape, loss_cfg.num_bins,
                            loss_cfg.lut_superpixel_size))

    # Mesh: data axis defaults to gcd(batch, n_devices), as in cmd_flow_train;
    # the sharded step inserts the gradient psum (the NCCL all-reduce analog).
    if args.mesh:
        mesh = make_mesh(data=args.mesh[0], event=args.mesh[1])
    else:
        mesh = make_mesh(data=math.gcd(tcfg["batch_size"], len(jax.devices())),
                         event=1)

    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), image_hw)
    state = replicate(mesh, state)
    if supervised:
        step = make_sharded_train_step(
            functools.partial(raft_supervised_train_step, cfg=cfg), mesh)
    else:
        step = make_sharded_train_step(functools.partial(
            raft_train_step, cfg=cfg, loss_cfg=loss_cfg,
            num_pos_events=pos_capacity if pab else -1,
            # `training.gamma=0.8` scores every GRU iteration with the
            # RAFT-lineage exponential weights; default supervises the
            # final iteration only (the measured bench operating point).
            # `training.gamma_sample_k=K` subsamples K of the non-final
            # iterations per step (unbiased reweighting) — the affordable
            # gamma recipe (training/raft_spline.py docstring).
            gamma=tcfg.get("gamma"),
            gamma_sample_k=tcfg.get("gamma_sample_k")), mesh)

    # Validation + best-k model selection (reference ModelCheckpoint-on-val,
    # scripts/flow_training.py:110-116): the eval split runs through
    # raft_validation_step (test-mode iters) every --val-every steps and
    # `val/masked_TEPE` drives best-k checkpoint retention.
    val_provider = val_step_fn = None
    val_monitor = "val/masked_TEPE"
    if args.val_every > 0:
        if ds.get("name") == "multiflow":
            test_dir = _P(ds["path"]) / "test"
            if test_dir.is_dir():
                from ..data.multiflow import MultiflowDatasubset as _MFD

                val_provider = _MFD(
                    test_dir, num_bins_context=cfg.nbins_context,
                    flow_every_n_ms=ds["flow_every_n_ms"],
                    load_voxel_grid=ds.get("load_voxel_grid", True),
                    extended_voxel_grid=ds.get("extended_voxel_grid", True),
                    normalize_voxel_grid=ds.get("normalize_voxel_grid", True),
                    prediction_time_ms=ds.get("prediction_time", 500))
                val_ts = tuple(float(t)
                               for t in val_provider[0]["flow_timestamps"])
        elif (_P(ds["path"]) / "imo" / "eval").is_dir():
            val_provider = Evimo2Provider(
                ds["path"], nbins_context=cfg.nbins_context,
                flow_time_ms=ds["flow_time"],
                normalize_voxel_grid=ds["normalize_voxel_grid"],
                flow_every_n_ms=ds["flow_every_n_ms"])
            m = int(ds["flow_time"] // ds["flow_every_n_ms"])
            val_ts = tuple(np.linspace(0, 1, m + 1)[1:].tolist())
    if val_provider is not None:
        vc = cfg_tree.get("validation", {}) or {}
        val_cfg = dataclasses.replace(cfg, iters=mc["num_iter"]["test"])
        val_step_fn = jax.jit(functools.partial(
            raft_validation_step, cfg=val_cfg, flow_timestamps=val_ts,
            min_traj_len=vc.get("min_traj_len"),
            max_traj_len=vc.get("max_traj_len")))

    workdir = args.workdir or f"runs/traj_{datetime.now():%Y%m%d_%H%M%S}"
    logger = ScalarLogger(workdir) if is_main else None
    key = jax.random.PRNGKey(1)
    n_steps = 0
    best = float("inf")

    def run_validation():
        nonlocal best
        # Under multi-host every process evaluates the full (deterministic)
        # val split with a host-local state copy, so the monitored metric is
        # identical across processes and the collective orbax save sees one
        # consistent value.
        eval_state = _host_local_state(state) if n_proc > 1 else state
        val = _run_traj_validation(val_step_fn, eval_state, val_provider,
                                   args.val_batch_size,
                                   cfg.use_boundary_images)
        if is_main:
            logger.log(n_steps, val)
        metric = val.get(val_monitor, val.get("val/epe"))
        save_checkpoint(str(Path(workdir) / "checkpoints"), state,
                        step=n_steps, metric=metric)
        if metric is not None and metric < best:
            best = metric
            if is_main:
                logger.log(n_steps,
                           {f"{k}_at_best": v for k, v in val.items()})

    while n_steps < args.max_steps:
        for batch in loader:
            key, sub = jax.random.split(key)
            if supervised:
                dev_batch = {k: batch[k]
                             for k in ("ev_repr", "flow", "flow_timestamps")}
                if "flow_valid" in batch:
                    dev_batch["flow_valid"] = batch["flow_valid"]
            else:
                dev_batch = {"ev_repr": batch["ev_repr"],
                             "events": batch["events"]}
                if "lut_cell_ends" in batch:
                    dev_batch["lut_cell_ends"] = batch["lut_cell_ends"]
            if n_proc > 1:
                from ..parallel.distributed import host_local_batch_to_global

                dev_batch = host_local_batch_to_global(mesh, dev_batch)
            else:
                dev_batch = shard_batch(mesh, dev_batch)
            state, logs = step(state, dev_batch, sub)
            n_steps += 1
            if n_steps % args.log_every == 0 and is_main:
                logger.log(n_steps, {k: float(v) for k, v in logs.items()})
            if val_step_fn is not None:
                # Validation saves carry the monitored metric; periodic
                # metric-less saves would corrupt best-k retention, so
                # --ckpt-every is superseded when a val split exists.
                if n_steps % args.val_every == 0 or n_steps >= args.max_steps:
                    run_validation()
            elif n_steps % args.ckpt_every == 0 or n_steps >= args.max_steps:
                save_checkpoint(str(Path(workdir) / "checkpoints"), state,
                                step=n_steps)
            if n_steps >= args.max_steps:
                break
    if is_main:
        logger.close()
        print(f"done: {n_steps} steps -> {workdir}")
    return 0


def cmd_extract_weights(args) -> int:
    """Checkpoint -> bare weights npz (reference
    scripts/extract_weights_from_checkpoint.py strips the Lightning ckpt's
    'model.' prefix; this additionally accepts the framework's own orbax
    checkpoint dirs, flattening params + batch_stats to 'params/...' /
    'batch_stats/...' keys consumable by dsec-infer)."""
    from ..training.checkpoint import (extract_model_weights,
                                       flatten_model_weights,
                                       restore_raw_checkpoint)

    if Path(args.ckpt).is_dir():  # orbax checkpoint dir
        tree, step = restore_raw_checkpoint(args.ckpt, best=True)
        weights = {**flatten_model_weights(tree["params"], "params"),
                   **flatten_model_weights(tree.get("batch_stats") or {},
                                           "batch_stats")}
        print(f"extracted orbax step {step}")
    else:
        weights = extract_model_weights(args.ckpt)
    np.savez(args.out, **weights)
    print(f"wrote {len(weights)} arrays -> {args.out}")
    return 0


def _parse_buckets(value: str):
    try:
        buckets = tuple(int(b) for b in value.split(","))
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected comma-separated integers, got {value!r}")
    if not buckets or any(b <= 0 for b in buckets) or \
            list(buckets) != sorted(buckets):
        raise argparse.ArgumentTypeError(
            f"buckets must be positive and ascending, got {value!r}")
    return buckets


def _parse_mesh(value: str):
    parts = value.split(",")
    if len(parts) != 2:
        raise argparse.ArgumentTypeError(
            f"expected DATA,EVENT axis sizes, got {value!r}")
    try:
        data, event = (int(p) for p in parts)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected DATA,EVENT axis sizes, got {value!r}")
    if data <= 0 or event <= 0:
        raise argparse.ArgumentTypeError("mesh axis sizes must be positive")
    return (data, event)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="motionpriorcmax_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("flow-train", help="self-supervised DSEC flow training")
    p.add_argument("--config", required=True)
    p.add_argument("--workdir", default=None)
    p.add_argument("--ckp_path", default=None)
    p.add_argument("--event-capacity", type=int, default=1 << 20)
    p.add_argument("--device-voxelize", action="store_true",
                   help="voxelize inside the jitted step (XLA scatter; "
                        "785 ms at b8 x 1M) instead of the default host "
                        "C++ vote in the loader threads")
    p.add_argument("--event-capacity-buckets", default=None,
                   type=_parse_buckets,
                   help="comma-separated ascending capacities; batches pad to "
                        "the smallest covering bucket (one compile each) "
                        "instead of always --event-capacity")
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--mesh", default=None, type=_parse_mesh,
                   help="data,event mesh axis sizes (default: "
                        "gcd(batch, n_devices),1)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator host:port "
                        "(jax.distributed; run this command on every host)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.set_defaults(fn=cmd_flow_train)

    p = sub.add_parser("dsec-infer", help="DSEC benchmark PNG inference")
    p.add_argument("--config", required=True)
    p.add_argument("--timestamp-dir", default="config/misc/dsec_test_timestamps")
    p.add_argument("--ckpt-step", type=int, default=None,
                   help="orbax step to restore (default: best-metric "
                        "retained checkpoint, else latest)")
    p.set_defaults(fn=cmd_dsec_infer)

    p = sub.add_parser("traj-val", help="EVIMO2 trajectory validation")
    p.add_argument("--config-dir", required=True)
    p.add_argument("--config-name", default="val")
    p.add_argument("overrides", nargs="*")
    p.set_defaults(fn=cmd_traj_val)

    p = sub.add_parser("traj-train", help="self-supervised trajectory training")
    p.add_argument("--config-dir", required=True)
    p.add_argument("--config-name", default="val")
    p.add_argument("--workdir", default=None)
    p.add_argument("--max-steps", type=int, default=100000)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--event-capacity", type=int, default=1 << 20)
    p.add_argument("--loss", choices=("selfsup", "supervised"),
                   default="selfsup",
                   help="selfsup = CMax focus loss on raw events (EVIMO2 or "
                        "MultiFlow); supervised = gamma-weighted L1 against "
                        "GT multi-step flow (MultiFlow only)")
    p.add_argument("--val-every", type=int, default=1000,
                   help="run validation + best-k selection every N steps "
                        "(0 disables; needs an eval split on disk)")
    p.add_argument("--val-batch-size", type=int, default=4)
    p.add_argument("--mesh", default=None, type=_parse_mesh,
                   help="data,event mesh axis sizes (default: "
                        "gcd(batch, n_devices),1)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator host:port "
                        "(jax.distributed; run this command on every host)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("overrides", nargs="*")
    p.set_defaults(fn=cmd_traj_train)

    p = sub.add_parser("extract-weights", help="ckpt -> bare weights npz")
    p.add_argument("ckpt")
    p.add_argument("out")
    p.set_defaults(fn=cmd_extract_weights)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
