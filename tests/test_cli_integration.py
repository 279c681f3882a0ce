"""CLI integration on a synthetic on-disk dataset: inference.py's eval loop
and train.py's training loop run end-to-end through the real entry-point
code paths (random weights — exercises IO, batching, evaluation, and
checkpointing, not metric quality)."""
import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from onepose_tpu.config import Config


def build_dataset(tmp_path, rng, n_frames=5, n_points=30, img_hw=96,
                  dim=256):
    """Synthetic object capture + SfM annotation artifacts on disk."""
    cv2 = pytest.importorskip("cv2")
    from onepose_tpu.utils import geometry as geo

    obj = tmp_path / "data" / "onepose_datasets" / "test_data" / "0001-obj-box"
    seq = obj / "obj-1"
    for d in ("color", "intrin_ba", "poses_ba"):
        (seq / d).mkdir(parents=True)

    K = np.array([[100.0, 0, img_hw / 2], [0, 100.0, img_hw / 2],
                  [0, 0, 1]])
    np.savetxt(str(obj / "box3d_corners.txt"), np.array([
        [0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0],
        [0, 0, 1], [0, 1, 1], [1, 1, 1], [1, 0, 1]]) * 0.3 - 0.15)
    with open(str(seq / "intrinsics.txt"), "w") as f:
        f.write("fx: 100.0\nfy: 100.0\ncx: 48.0\ncy: 48.0\n")

    for i in range(n_frames):
        img = (rng.uniform(0, 255, (img_hw, img_hw))).astype(np.uint8)
        cv2.imwrite(str(seq / "color" / f"{i}.png"), img)
        np.savetxt(str(seq / "intrin_ba" / f"{i}.txt"), K)
        pose = np.eye(4)
        pose[:3, :3] = geo.rodrigues(rng.normal(size=3) * 0.3)
        pose[:3, 3] = [0, 0, 0.5]
        np.savetxt(str(seq / "poses_ba" / f"{i}.txt"), pose)

    # SfM annotation artifacts
    anno_dir = (tmp_path / "data" / "sfm_model" / "0001-obj-box"
                / "outputs_superpoint_superglue" / "anno")
    anno_dir.mkdir(parents=True)
    idxs = rng.integers(2, 6, n_points)
    total = int(idxs.sum())
    xyzs = rng.uniform(-0.1, 0.1, (n_points, 3))
    avg_desc = rng.normal(size=(dim, n_points)).astype(np.float32)
    clt_desc = rng.normal(size=(dim, total)).astype(np.float32)
    np.savez(str(anno_dir / "anno_3d_average.npz"), keypoints3d=xyzs,
             descriptors3d=avg_desc,
             scores3d=rng.uniform(0, 1, (n_points, 1)).astype(np.float32))
    np.savez(str(anno_dir / "anno_3d_collect.npz"), keypoints3d=xyzs,
             descriptors3d=clt_desc,
             scores3d=rng.uniform(0, 1, (total, 1)).astype(np.float32))
    np.save(str(anno_dir / "idxs.npy"), idxs)

    # per-image 2D annos + merged train.json (train path)
    anno2d_list = []
    img_anno_dir = seq.parent / "obj-1" / "anno_superpoint"
    img_anno_dir.mkdir()
    for i in range(n_frames):
        n2d = 20
        anno_2d_path = str(img_anno_dir / f"{i}.json")
        assign = np.stack([rng.permutation(n2d)[:8],
                           rng.permutation(n_points)[:8]])
        with open(anno_2d_path, "w") as f:
            json.dump({
                "keypoints2d": rng.uniform(
                    0, img_hw, (n2d, 2)).tolist(),
                "descriptors2d": rng.normal(
                    size=(dim, n2d)).tolist(),
                "scores2d": rng.uniform(0, 1, (n2d, 1)).tolist(),
                "assign_matrix": assign.tolist(),
                "num_matches": 8,
            }, f)
        anno2d_list.append({
            "anno_id": i + 1, "anno_file": anno_2d_path,
            "img_file": str(seq / "color" / f"{i}.png"),
            "pose_file": str(seq / "poses_ba" / f"{i}.txt"),
        })
    with open(str(anno_dir / "anno_2d.json"), "w") as f:
        json.dump(anno2d_list, f)
    return tmp_path


def test_inference_cli_integration(tmp_path):
    rng = np.random.default_rng(0)
    build_dataset(tmp_path, rng)
    import jax

    import inference as inference_cli
    from onepose_tpu.models import gats_spg, superpoint

    root = str(tmp_path)
    cfg = Config({
        "network": Config({"detection": "superpoint",
                           "matching": "superglue"}),
        "num_leaf": 4,
        "shape3d": 32,
        "max_keypoints": 64,
        "object_detect_mode": "GT_box",
        "batch_size": 2,
        "pnp": Config({"reproj_threshold": 5.0, "num_hypotheses": 32,
                       "refine_iters": 2}),
        "save_wis3d": True,
        "output": Config({"eval_dir": osp.join(root, "runs/eval"),
                          "vis_dir": osp.join(root, "runs/vis")}),
    })
    sp_params = superpoint.init_params(jax.random.PRNGKey(0))
    gats_params = gats_spg.init_params(jax.random.PRNGKey(1))

    data_root = osp.join(
        root, "data/onepose_datasets/test_data/0001-obj-box")
    res = inference_cli.inference_core(
        cfg, data_root, osp.join(data_root, "obj-1"),
        osp.join(root, "data/sfm_model/0001-obj-box"),
        sp_params, gats_params)
    assert set(res.keys()) == {"cmd1", "cmd3", "cmd5"}
    report = osp.join(root, "runs/eval", "0001-obj-boxobj-1.txt")
    assert osp.exists(report)
    txt = open(report).read()
    assert "cmd1" in txt
    # interactive scene dump (wis3d stand-in)
    scene = osp.join(root, "runs/vis", "0001-obj-box_obj-1.html")
    assert osp.exists(scene)
    assert "<canvas" in open(scene).read()


@pytest.mark.slow
def test_train_cli_integration(tmp_path):
    rng = np.random.default_rng(1)
    build_dataset(tmp_path, rng)
    import train as train_cli
    from onepose_tpu.datasets.merge import merge_anno

    root = str(tmp_path)
    out_json = osp.join(root, "data/cache/onepose/train.json")
    n = merge_anno(osp.join(root, "data/sfm_model"), ["0001-obj-box"],
                   out_json)
    assert n == 5

    cfg = Config({
        "seed": 0,
        "parallel": Config({"n_devices": 2}),
        "model": Config({
            "descriptor_dim": 256, "scale_factor": 0.07,
            "match_threshold": 0.2, "include_self": True,
            "additional": False, "with_linear_transform": False,
            "lr": 1e-4, "weight_decay": 0.0, "milestones": [5],
            "gamma": 0.5,
            "spp_model_path": osp.join(root, "missing.pth"),
        }),
        "trainer": Config({
            "max_epochs": 1, "gradient_clip_val": 0.5,
            "accumulate_grad_batches": 1, "log_every_n_steps": 1,
        }),
        "datamodule": Config({
            "train_anno_file": out_json,
            "val_anno_file": osp.join(root, "missing.json"),
            "batch_size": 2, "num_leaf": 4, "shape2d": 32,
            "shape3d": 48, "assign_pad_val": 0,
        }),
        "checkpoint": Config({"dirpath": osp.join(root, "ckpts")}),
        "logging": Config({"log_dir": osp.join(root, "logs")}),
    })
    state, _ = train_cli.train(cfg)
    assert np.isfinite(float(state.step))
    assert osp.exists(osp.join(root, "ckpts", "epoch=0"))
    assert osp.exists(osp.join(root, "ckpts", "last"))
    lines = open(osp.join(root, "logs", "metrics.jsonl")).readlines()
    assert any("train_loss" in ln for ln in lines)

    # checkpoint roundtrip
    from onepose_tpu.utils import model_io

    params = model_io.load_pytree(osp.join(root, "ckpts", "last"))
    import jax

    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 state.params))):
        np.testing.assert_allclose(a, b)


def test_train_resume(tmp_path):
    """A second train() run must resume from the epoch checkpoint."""
    rng = np.random.default_rng(2)
    build_dataset(tmp_path, rng)
    import train as train_cli
    from onepose_tpu.datasets.merge import merge_anno

    root = str(tmp_path)
    out_json = osp.join(root, "data/cache/onepose/train.json")
    merge_anno(osp.join(root, "data/sfm_model"), ["0001-obj-box"],
               out_json)

    def make_cfg(max_epochs):
        return Config({
            "seed": 0,
            "parallel": Config({"n_devices": 1}),
            "model": Config({
                "descriptor_dim": 256, "scale_factor": 0.07,
                "match_threshold": 0.2, "include_self": True,
                "additional": False, "with_linear_transform": False,
                "lr": 1e-4, "weight_decay": 0.0, "milestones": [5],
                "gamma": 0.5,
                "spp_model_path": osp.join(root, "missing.pth"),
            }),
            "trainer": Config({
                "max_epochs": max_epochs, "gradient_clip_val": 0.5,
                "accumulate_grad_batches": 1, "log_every_n_steps": 1,
            }),
            "datamodule": Config({
                "train_anno_file": out_json,
                "val_anno_file": osp.join(root, "missing.json"),
                "batch_size": 2, "num_leaf": 4, "shape2d": 32,
                "shape3d": 48, "assign_pad_val": 0,
            }),
            "checkpoint": Config({"dirpath": osp.join(root, "ckpts")}),
            "logging": Config({"log_dir": osp.join(root, "logs")}),
        })

    state1, _ = train_cli.train(make_cfg(1))
    step_after_1 = int(np.asarray(state1.step))
    state2, _ = train_cli.train(make_cfg(2))  # resumes at epoch 1
    assert int(np.asarray(state2.step)) > step_after_1
    assert osp.exists(osp.join(root, "ckpts", "epoch=1"))


def test_validate_with_plots(tmp_path):
    """train.validate: pose metrics + reprojection match figures."""
    rng = np.random.default_rng(3)
    build_dataset(tmp_path, rng)
    import jax

    import train as train_cli
    from onepose_tpu.datasets.merge import merge_anno
    from onepose_tpu.models import superpoint
    from onepose_tpu.utils import model_io

    root = str(tmp_path)
    val_json = osp.join(root, "data/cache/onepose/val.json")
    merge_anno(osp.join(root, "data/sfm_model"), ["0001-obj-box"],
               val_json)
    sp_dir = osp.join(root, "weights_sp")
    model_io.save_pytree(
        superpoint.init_params(jax.random.PRNGKey(0)), sp_dir)

    from onepose_tpu.models import gats_spg

    cfg = Config({
        "seed": 0,
        "model": Config({"spp_model_path": sp_dir}),
        "datamodule": Config({
            "val_anno_file": val_json, "num_leaf": 4,
            "shape2d": 32, "shape3d": 48}),
        "logging": Config({"log_dir": osp.join(root, "logs")}),
    })
    params = gats_spg.init_params(jax.random.PRNGKey(1),
                                  {"num_blocks": 1})
    metrics = train_cli.validate(
        cfg, params, {"num_blocks": 1, "match_threshold": 0.0}, epoch=0,
                                 n_plots=2)
    assert {"1cm@1degree", "3cm@3degree", "5cm@5degree"} <= set(metrics)
    # f1/precision/recall heatmap callback metrics ride along
    assert "val_f1/match_correct" in metrics
    import glob as _glob

    plots = _glob.glob(osp.join(root, "logs", "val_plots", "*.png"))
    assert len(plots) >= 1


def test_inference_cli_data_parallel(tmp_path):
    """inference_core with n_devices=2 runs the eval loop SPMD over the
    virtual CPU mesh (mesh-aware loader path included) and produces the
    same report artifacts."""
    rng = np.random.default_rng(0)
    build_dataset(tmp_path, rng)
    import jax

    import inference as inference_cli
    from onepose_tpu.models import gats_spg, superpoint

    root = str(tmp_path)
    cfg = Config({
        "network": Config({"detection": "superpoint",
                           "matching": "superglue"}),
        "num_leaf": 4,
        "shape3d": 32,
        "max_keypoints": 64,
        "object_detect_mode": "GT_box",
        "batch_size": 2,
        "n_devices": 2,
        "pnp": Config({"reproj_threshold": 5.0, "num_hypotheses": 32,
                       "refine_iters": 2}),
        "output": Config({"eval_dir": osp.join(root, "runs/eval_dp"),
                          "vis_dir": osp.join(root, "runs/vis_dp")}),
    })
    sp_params = superpoint.init_params(jax.random.PRNGKey(0))
    gats_params = gats_spg.init_params(jax.random.PRNGKey(1))

    data_root = osp.join(
        root, "data/onepose_datasets/test_data/0001-obj-box")
    res = inference_cli.inference_core(
        cfg, data_root, osp.join(data_root, "obj-1"),
        osp.join(root, "data/sfm_model/0001-obj-box"),
        sp_params, gats_params)
    assert set(res.keys()) == {"cmd1", "cmd3", "cmd5"}
    assert osp.exists(
        osp.join(root, "runs/eval_dp", "0001-obj-boxobj-1.txt"))
    jax.clear_caches()  # SPMD executables: suite memory budget


def test_train_returns_callback_metrics(tmp_path):
    """train() must return the callback-metrics dict (the reference's
    optuna surface returns trainer.callback_metrics[optimized_metric],
    /root/reference/train.py:74-76)."""
    rng = np.random.default_rng(2)
    build_dataset(tmp_path, rng)
    import train as train_cli
    from onepose_tpu.datasets.merge import merge_anno

    root = str(tmp_path)
    out_json = osp.join(root, "data/cache/onepose/train.json")
    merge_anno(osp.join(root, "data/sfm_model"), ["0001-obj-box"],
               out_json)
    cfg = Config({
        "seed": 0,
        "parallel": Config({"n_devices": 1}),
        "model": Config({
            "descriptor_dim": 256, "scale_factor": 0.07,
            "match_threshold": 0.2, "include_self": True,
            "additional": False, "with_linear_transform": False,
            "lr": 1e-4, "weight_decay": 0.0, "milestones": [5],
            "gamma": 0.5,
            "spp_model_path": osp.join(root, "missing.pth"),
        }),
        "trainer": Config({
            "max_epochs": 1, "gradient_clip_val": 0.5,
            "accumulate_grad_batches": 1, "log_every_n_steps": 1,
        }),
        "datamodule": Config({
            "train_anno_file": out_json,
            "val_anno_file": osp.join(root, "missing.json"),
            "batch_size": 2, "num_leaf": 4, "shape2d": 32,
            "shape3d": 48, "assign_pad_val": 0,
        }),
        "checkpoint": Config({"dirpath": osp.join(root, "ckpts")}),
        "logging": Config({"log_dir": osp.join(root, "logs")}),
    })
    _, metrics = train_cli.train(cfg)
    assert "train_loss" in metrics and np.isfinite(metrics["train_loss"])


def test_multirun_sweep(monkeypatch, capsys):
    """-m sweeps the cartesian product and reports the best run."""
    import sys

    import train as train_cli

    calls = []

    def fake_run_one(overrides):
        calls.append(list(overrides))
        lr = float([o for o in overrides if o.startswith("model.lr=")]
                   [0].split("=")[1])
        return {1e-3: 0.9, 1e-4: 0.7}[lr]

    monkeypatch.setattr(train_cli, "run_one", fake_run_one)
    monkeypatch.setattr(sys, "argv",
                        ["train.py", "-m", "model.lr=1e-3,1e-4",
                         "seed=0"])
    best = train_cli.main()
    assert len(calls) == 2
    assert calls[0] == ["model.lr=1e-3", "seed=0"]
    assert best == 0.9
    assert "best: model.lr=1e-3" in capsys.readouterr().out
