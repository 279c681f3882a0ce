#!/usr/bin/env python
"""Train the GATsSPG matcher.

Public-surface equivalent of the reference's ``train.py`` + Lightning module
(/root/reference/train.py, src/models/GATsSPG_lightning_model.py): Adam +
MultiStep LR, focal loss, gradient clipping/accumulation, per-epoch
validation with pose metrics, epoch checkpoints.

TPU-native: jitted data-parallel train step over the local device mesh
(gradient psum inserted by XLA), orbax checkpoints, on-device val PnP.

    python train.py +experiment=train_GATsSPG
"""
import os
import os.path as osp
import sys
import time

import numpy as np


def train(cfg):
    """Run training; returns (final_state, callback_metrics).

    callback_metrics holds the last logged value of every metric
    (train_loss + validation pose metrics) — the role of Lightning's
    ``trainer.callback_metrics`` that the reference's optuna return reads
    (/root/reference/train.py:74-76).
    """
    from onepose_tpu.parallel import launch as plaunch

    # Multi-host: one process per host, coordinator via config/env; no-op
    # single-process. Must run before any other jax use.
    plaunch.maybe_initialize(cfg.get("parallel", None))

    import jax

    from onepose_tpu.datasets.gats_dataset import GATsSPGDataset
    from onepose_tpu.parallel import collectives as comm
    from onepose_tpu.parallel import mesh as pmesh
    from onepose_tpu.train import trainer
    from onepose_tpu.utils import model_io

    is_main = comm.is_main_process()
    world = jax.process_count()
    n_devices = cfg.parallel.n_devices or len(jax.devices())
    mesh = pmesh.make_mesh(n_devices)
    if is_main:
        print(f"[train] mesh: {mesh} ({world} processes)")

    gats_cfg = {
        "descriptor_dim": cfg.model.descriptor_dim,
        "scale_factor": cfg.model.scale_factor,
        "match_threshold": cfg.model.match_threshold,
        "include_self": cfg.model.include_self,
        "additional": cfg.model.additional,
        "with_linear_transform": cfg.model.with_linear_transform,
    }

    train_ds = GATsSPGDataset(
        cfg.datamodule.train_anno_file, num_leaf=cfg.datamodule.num_leaf,
        split="train", shape2d=cfg.datamodule.shape2d,
        shape3d=cfg.datamodule.shape3d,
        pad_val=cfg.datamodule.assign_pad_val, seed=cfg.seed)
    steps_per_epoch = max(len(train_ds) // cfg.datamodule.batch_size, 1)

    tx = trainer.make_optimizer(
        base_lr=float(cfg.model.lr),
        weight_decay=float(cfg.model.weight_decay),
        milestones_steps=[m * steps_per_epoch for m in cfg.model.milestones],
        gamma=cfg.model.gamma,
        grad_clip=cfg.trainer.gradient_clip_val,
        accumulate_steps=cfg.trainer.accumulate_grad_batches)
    state = trainer.init_train_state(
        jax.random.PRNGKey(cfg.seed), tx, gats_cfg)

    start_epoch = 0
    resume = cfg.get("resume", True)
    latest = model_io.latest_checkpoint(cfg.checkpoint.dirpath) \
        if resume else None
    if latest is not None:
        import re

        restored = model_io.load_pytree(
            latest, {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step})
        # host-numpy leaves: orbax returns device-committed arrays whose
        # replicate() over a multi-host mesh would need an unsupported
        # cross-host transfer
        restored = jax.tree.map(np.asarray, restored)
        state = trainer.TrainState(
            restored["params"], restored["opt_state"], restored["step"])
        start_epoch = int(re.search(
            r"epoch=(\d+)", osp.basename(latest)).group(1)) + 1
        print(f"[train] resumed from {latest} (epoch {start_epoch})")

    state = pmesh.replicate(mesh, state)
    step_fn = trainer.make_train_step(tx, gats_cfg)

    from onepose_tpu.train.logging import MetricLogger

    # Process 0 owns the filesystem artifacts (checkpoints, logs, prints);
    # other ranks only feed their local batch slice and step.
    logger = None
    if is_main:
        os.makedirs(cfg.checkpoint.dirpath, exist_ok=True)
        logger = MetricLogger(
            cfg.logging.log_dir,
            wandb_project=cfg.logging.get("wandb_project"),
            wandb_config={"model": dict(cfg.model),
                          "datamodule": dict(cfg.datamodule)})
    lr_sched = trainer.multistep_schedule(
        float(cfg.model.lr),
        [m * steps_per_epoch for m in cfg.model.milestones],
        cfg.model.gamma)

    # model-watch callback (reference WatchModelWithWandb role,
    # wandb_callbacks.py:67-82; off by default like the reference config)
    watcher = None
    if is_main and cfg.logging.get("watch_model"):
        from onepose_tpu.train.callbacks import ModelWatcher

        watcher = ModelWatcher(
            logger, log_freq=int(cfg.logging.get("watch_log_freq", 100)))

    rank = comm.get_rank()
    global_bs = cfg.datamodule.batch_size
    if global_bs % world != 0:
        raise ValueError(
            f"batch_size {global_bs} not divisible by {world} processes")
    local_bs = global_bs // world
    lo, hi = rank * local_bs, (rank + 1) * local_bs

    # Device-resident input path (default): all objects' observation
    # descriptors upload once; per step the host ships leaf indices, query
    # descriptors, and sparse GT pairs — the leaf gather and dense conf_gt
    # materialize on device (trainer.materialize_light_batch).
    device_resident = bool(cfg.datamodule.get("device_resident", True))
    # on-device leaf sampling: ship a per-item seed instead of running
    # the sampling lexsort on host (default on — the host path remains
    # for the sample-exact-equality test)
    device_leaves = bool(cfg.datamodule.get("device_leaf_sampling", True))
    if device_resident:
        db_np, obj_index = train_ds.device_db()
        db_keys = ["clt_stack", "avg_stack"]
        if device_leaves:
            db_keys += ["count_stack", "offset_stack"]
        db = pmesh.replicate(mesh, {k: db_np[k] for k in db_keys})
        gather_step_fn = trainer.make_gather_train_step(
            tx, gats_cfg, db, cfg.datamodule.shape2d,
            cfg.datamodule.shape3d, cfg.datamodule.assign_pad_val,
            num_leaf=int(cfg.datamodule.num_leaf))
        if is_main:
            print(f"[train] device-resident DB: "
                  f"{db_np['clt_stack'].nbytes / 1e6:.0f} MB, "
                  f"{len(obj_index)} objects")

    # Slice the local rows + start the sharded device_put on a staging
    # thread two batches ahead: upload overlaps the step
    # (runtime.loader.stage_ahead), so the loop costs max(upload, step)
    # rather than their sum.
    from onepose_tpu.runtime.loader import stage_ahead

    host_keys = ("descriptors2d_query", "descriptors3d_db",
                 "descriptors2d_db", "conf_gt")
    if device_resident:
        def to_device(batch_np):
            return pmesh.shard_batch(
                mesh, {k: v[lo:hi] for k, v in batch_np.items()})
    else:
        def to_device(batch_np):
            return pmesh.shard_batch(
                mesh, {k: batch_np[k][lo:hi] for k in host_keys})

    global_step = int(np.asarray(state.step))
    callback_metrics = {}
    for epoch in range(start_epoch, cfg.trainer.max_epochs):
        t0 = time.time()
        losses = []
        # every process iterates the same deterministic batch order (same
        # seed) and slices its local rows of each global batch
        if device_resident:
            batch_iter = train_ds.light_batches(
                obj_index, db_np["t_max"], global_bs, shuffle=True,
                seed=cfg.seed + epoch, on_device_leaves=device_leaves)
        else:
            batch_iter = train_ds.batches(
                global_bs, shuffle=True, seed=cfg.seed + epoch)

        for batch in stage_ahead(batch_iter, to_device):
            if device_resident:
                state, loss = gather_step_fn(state, batch)
            else:
                state, loss = step_fn(state, batch)
            global_step += 1
            if watcher is not None:
                watcher.step(global_step, state.params)
            if global_step % cfg.trainer.log_every_n_steps == 0:
                loss_val = float(loss)
                losses.append(loss_val)
                if logger is not None:
                    logger.log(global_step, {
                        "epoch": epoch, "train_loss": loss_val,
                        "lr": float(lr_sched(global_step)),
                    })
        epoch_loss = float(np.mean(losses)) if losses else float("nan")
        callback_metrics["train_loss"] = epoch_loss
        if is_main:
            print(f"[train] epoch {epoch}: loss={epoch_loss:.4f} "
                  f"({time.time() - t0:.1f}s, {global_step} steps)")

            ckpt_path = osp.join(cfg.checkpoint.dirpath, f"epoch={epoch}")
            model_io.save_train_state(
                jax.tree.map(np.asarray, state), ckpt_path)
            logger.log_checkpoint(ckpt_path)
            model_io.save_pytree(
                jax.tree.map(np.asarray, state.params),
                osp.join(cfg.checkpoint.dirpath, "last"))

            val_metrics = validate(cfg, state.params, gats_cfg, epoch=epoch)
            if val_metrics:
                callback_metrics.update(val_metrics)
                if logger is not None:
                    logger.log(global_step, {"epoch": epoch, **val_metrics})
        comm.synchronize()
    if logger is not None:
        logger.close()
    return state, callback_metrics


def validate(cfg, params, gats_cfg, epoch=0, n_plots=10, val_batch=8):
    """Validation with live SuperPoint extraction + on-device PnP
    (reference validation_step semantics), plus reprojection match figures
    every val_plot_interval items (reference draw_reprojection_pair role,
    GATsSPG_lightning_model.py:65-68).

    Batched: items are grouped by object so each object's 3D DB is built
    and uploaded ONCE, and frames run through the fused pipeline in
    fixed-size batches (last chunk padded so the jitted program is reused).
    """
    import jax

    from onepose_tpu import pipeline
    from onepose_tpu.datasets.gats_dataset import GATsSPGDataset
    from onepose_tpu.utils import geometry as geo, model_io, vis_utils

    if not osp.exists(cfg.datamodule.val_anno_file):
        print("[val] no val annotations; skipping")
        return None
    try:
        sp_params = model_io.load_superpoint_params(
            cfg.model.spp_model_path)
    except FileNotFoundError:
        print("[val] no SuperPoint weights; skipping")
        return None

    val_ds = GATsSPGDataset(
        cfg.datamodule.val_anno_file, num_leaf=cfg.datamodule.num_leaf,
        split="val", shape2d=cfg.datamodule.shape2d,
        shape3d=cfg.datamodule.shape3d, load_pose_gt=True, seed=cfg.seed)

    from onepose_tpu.datasets.anno import ObjectDB

    plot_interval = max(len(val_ds) // n_plots, 1)
    plot_dir = osp.join(cfg.logging.log_dir, "val_plots")

    # group items by object DB (the avg-anno path identifies the object)
    groups = {}
    for i, ann in enumerate(val_ds.items):
        groups.setdefault(ann["avg_anno3d_file"], []).append(i)

    from onepose_tpu.train.callbacks import (
        MATCH_CLASS_NAMES, ClassificationHeatmaps,
        match_classification_labels)

    heatmaps = ClassificationHeatmaps(MATCH_CLASS_NAMES)
    R_errs = np.full(len(val_ds), np.inf)
    t_errs = np.full(len(val_ds), np.inf)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for anno_file in sorted(groups):
        idx_list = groups[anno_file]
        rng = np.random.default_rng(cfg.seed)
        kpts3d, avg_desc, leaf_desc, num3d = val_ds._read_anno3d(
            val_ds.items[idx_list[0]], rng)
        db = ObjectDB(
            keypoints3d=kpts3d, descriptors3d=avg_desc,
            scores3d=np.zeros(len(kpts3d), np.float32),
            descriptors2d_db=leaf_desc,
            scores2d_db=np.zeros(len(leaf_desc), np.float32),
            mask3d=np.arange(len(kpts3d)) < num3d,
            num_leaf=cfg.datamodule.num_leaf, num_points=num3d)
        pipe = pipeline.PosePipeline(
            sp_params, params, db, gats_config=gats_cfg,
            sp_config={"max_keypoints": 1024})

        for start in range(0, len(idx_list), val_batch):
            chunk = idx_list[start:start + val_batch]
            items = [val_ds.get_query(int(i)) for i in chunk]
            pad = val_batch - len(chunk)
            images = np.stack(
                [it["image"] for it in items]
                + [items[-1]["image"]] * pad)[..., None]
            Ks = np.stack(
                [it["query_intrinsic"] for it in items]
                + [items[-1]["query_intrinsic"]] * pad)
            key, sub = jax.random.split(key)
            out = pipe(images, Ks, jax.random.split(sub, val_batch))
            succ = np.asarray(out.success)
            poses = np.asarray(out.poses)
            for j, gi in enumerate(chunk):
                if succ[j]:
                    R_errs[gi], t_errs[gi] = geo.query_pose_error(
                        poses[j], items[j]["query_pose_gt"])
                # f1/confusion heatmap labels vs GT-pose reprojection
                gt_proj = geo.project_points(
                    kpts3d, items[j]["query_intrinsic"],
                    items[j]["query_pose_gt"])
                p_lbl, t_lbl = match_classification_labels(
                    np.asarray(out.matches0)[j],
                    np.asarray(out.kpt_mask)[j],
                    np.asarray(out.keypoints2d)[j], gt_proj,
                    np.arange(len(kpts3d)) < num3d)
                heatmaps.update(p_lbl, t_lbl)
                if gi % plot_interval == 0:
                    # matched 2D kpts vs GT-reprojected matched 3D points
                    m0 = np.asarray(out.matches0)[j]
                    kpts = np.asarray(out.keypoints2d)[j]
                    valid = (m0 >= 0) & np.asarray(out.kpt_mask)[j]
                    if valid.sum() >= 1:
                        mk3d = kpts3d[m0[valid]]
                        reproj = geo.project_points(
                            mk3d, items[j]["query_intrinsic"],
                            items[j]["query_pose_gt"])
                        vis_utils.draw_matches(
                            items[j]["image"], kpts[valid],
                            items[j]["image"], reproj,
                            save_path=osp.join(
                                plot_dir, f"epoch{epoch}_item{gi}.png"))
    metrics = geo.aggregate_metrics(
        {"R_errs": list(R_errs), "t_errs": list(t_errs)})
    metrics.update(heatmaps.emit(epoch=epoch, plot_dir=plot_dir))
    print(f"[val] {metrics} ({time.time() - t0:.1f}s, "
          f"{len(val_ds)} items, {len(groups)} objects)")
    return metrics


def run_one(overrides):
    """One train run; returns the optimized metric (or None).

    Mirrors the reference's optuna return: ``optimized_metric`` in the
    config names a callback metric whose final value is returned
    (/root/reference/train.py:74-76).
    """
    from onepose_tpu.config import load_config

    cfg = load_config(overrides)
    _, metrics = {"train": train}[cfg.type](cfg)
    name = cfg.get("optimized_metric")
    if name:
        if name not in metrics:
            raise KeyError(
                f"optimized_metric {name!r} not in callback metrics "
                f"{sorted(metrics)}")
        return metrics[name]
    return None


def main():
    """CLI. ``-m`` / ``--multirun`` sweeps comma-valued overrides
    (hydra basic-sweeper surface): each ``key=a,b,c`` becomes a sweep
    axis; runs the cartesian product and reports per-run + best
    ``optimized_metric``."""
    from onepose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()  # restart economics: DESIGN §11

    args = sys.argv[1:]
    multirun = False
    if args and args[0] in ("-m", "--multirun"):
        multirun = True
        args = args[1:]

    if not multirun:
        metric = run_one(args)
        if metric is not None:
            print(f"[train] optimized_metric: {metric}")
        return metric

    from onepose_tpu.config import expand_multirun

    combos = expand_multirun(args)
    results = []
    for i, combo in enumerate(combos):
        print(f"[multirun] job {i}/{len(combos)}: {' '.join(combo)}")
        results.append((combo, run_one(combo)))
    scored = [(c, m) for c, m in results if m is not None]
    for combo, metric in scored:
        print(f"[multirun] {' '.join(combo)} -> {metric}")
    if scored:
        # direction: optimize_direction=minimize override (losses), else max
        minimize = any(a.split("=", 1) == ["optimize_direction", "minimize"]
                       for a in args)
        pick = min if minimize else max
        best = pick(scored, key=lambda cm: cm[1])
        print(f"[multirun] best: {' '.join(best[0])} -> {best[1]}")
        return best[1]
    return None


if __name__ == "__main__":
    main()
