"""Full-framework end-to-end: synthetic multi-view scene → triangulation →
postprocess annotation artifacts → merged training index → TRAIN the GATsSPG
matcher on those artifacts → evaluate pose inference on held-out views with
the trained weights → cmd metrics.

This is the self-contained analogue of the reference's sample-data smoke
path (SURVEY §4): no external data or pretrained weights, yet every stage of
the framework (SfM geometry, artifact IO, dataset padding semantics,
training step, matcher, on-device PnP, evaluator) must cooperate for the
final recall numbers to come out high.
"""
import json
import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(__file__))

from test_sfm import make_scene, write_fixture_h5  # noqa: E402

from onepose_tpu import pipeline  # noqa: E402
from onepose_tpu.datasets import anno  # noqa: E402
from onepose_tpu.datasets.gats_dataset import GATsSPGDataset  # noqa: E402
from onepose_tpu.evaluators import Evaluator  # noqa: E402
from onepose_tpu.models import gats_spg  # noqa: E402
from onepose_tpu.sfm import postprocess, triangulate  # noqa: E402
from onepose_tpu.train import trainer  # noqa: E402
from onepose_tpu.utils import geometry as geo  # noqa: E402

DIM = 32  # fixture descriptor dim (write_fixture_h5); model is dim-agnostic


@pytest.mark.slow
def test_selftrain_end_to_end(tmp_path):
    rng = np.random.default_rng(0)

    # ---- 1. synthetic capture + SfM → annotation artifacts
    pts3d, K, poses, uvs, perms = make_scene(
        rng, n_points=48, n_cams=12, noise_px=0.3)
    names, feat_p, match_p, pair_list, Ks, poses_d, sizes = \
        write_fixture_h5(tmp_path, rng, pts3d, K, poses, uvs, perms,
                         outlier_matches=2)
    # write pose files so the dataset's pose lookups resolve
    for name, pose in poses_d.items():
        pdir = tmp_path / "poses"
        pdir.mkdir(exist_ok=True)
    model_dir = str(tmp_path / "sfm_ws" / "model")
    triangulate.triangulate_from_h5(
        feat_p, match_p, pair_list, Ks, poses_d, sizes, model_dir,
        verbose=False)
    anno_dir = str(tmp_path / "anno")
    pp = postprocess.postprocess(model_dir, feat_p, names, anno_dir)
    assert pp["num_points"] >= 40

    # ---- 2. merged training index over the per-image annos
    with open(osp.join(anno_dir, "anno_2d.json")) as f:
        annos = json.load(f)
    assert len(annos) == len(names)
    images, annotations = [], []
    for i, a in enumerate(annos):
        images.append({"id": i + 1, "img_file": a["img_file"]})
        annotations.append({
            "image_id": i + 1, "id": i + 1,
            "pose_file": a["pose_file"],
            "anno2d_file": a["anno_file"],
            "avg_anno3d_file": osp.join(anno_dir, "anno_3d_average.npz"),
            "collect_anno3d_file": osp.join(
                anno_dir, "anno_3d_collect.npz"),
            "idxs_file": osp.join(anno_dir, "idxs.npy"),
        })
    train_json = str(tmp_path / "train.json")
    with open(train_json, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)

    # ---- 3. train the matcher on the artifacts
    shape2d, shape3d, leaf = 64, 64, 2
    ds = GATsSPGDataset(train_json, num_leaf=leaf, split="train",
                        shape2d=shape2d, shape3d=shape3d, seed=0)
    cfg = {"num_blocks": 1, "descriptor_dim": DIM}
    tx = trainer.make_optimizer(base_lr=2e-3, grad_clip=0.5)
    state = trainer.init_train_state(jax.random.PRNGKey(0), tx, cfg)
    step = trainer.make_train_step(tx, cfg)

    losses = []
    for epoch in range(40):
        for batch_np in ds.batches(4, shuffle=True, seed=epoch):
            batch = {
                "descriptors2d_query": jnp.asarray(
                    batch_np["descriptors2d_query"]),
                "descriptors3d_db": jnp.asarray(
                    batch_np["descriptors3d_db"]),
                "descriptors2d_db": jnp.asarray(
                    batch_np["descriptors2d_db"]),
                "conf_gt": jnp.asarray(batch_np["conf_gt"]),
            }
            state, loss = step(state, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])

    # ---- 4. held-out eval: new camera views of the same object
    db = anno.load_object_db(
        osp.join(anno_dir, "anno_3d_average.npz"),
        osp.join(anno_dir, "anno_3d_collect.npz"),
        osp.join(anno_dir, "idxs.npy"), num_leaf=leaf, shape3d=shape3d)

    # query "SuperPoint output": project the merged points into held-out
    # views; descriptors = the GT point appearance + noise (matching the
    # fixture's generative model)
    import h5py

    with h5py.File(feat_p) as ff:
        # recover per-point appearance: average observed descriptors
        pass
    avg = np.load(osp.join(anno_dir, "anno_3d_average.npz"))
    point_desc = np.asarray(avg["descriptors3d"], np.float32).T  # [P, D]
    merged_xyz = np.asarray(avg["keypoints3d"], np.float32)
    P = merged_xyz.shape[0]

    evaluator = Evaluator()
    for trial in range(6):
        theta = 2 * np.pi * (trial + 0.5) / 6
        center = np.array(
            [0.55 * np.cos(theta), 0.55 * np.sin(theta), 0.35])
        z = -center / np.linalg.norm(center)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z])
        t = -R @ center
        pose_gt = np.concatenate([R, t[:, None]], axis=1)

        uv = geo.project_points(merged_xyz, K, pose_gt)
        uv += rng.normal(size=uv.shape) * 0.3
        q_desc = point_desc + 0.05 * rng.normal(
            size=point_desc.shape).astype(np.float32)
        q_desc /= np.linalg.norm(q_desc, axis=1, keepdims=True)

        # pad query side to shape2d
        n_pad = shape2d - P
        kpts2d = np.concatenate(
            [uv, rng.uniform(0, 512, (n_pad, 2))]).astype(np.float32)
        desc2d = np.concatenate(
            [q_desc, np.ones((n_pad, DIM), np.float32)])
        mask2d = np.zeros(shape2d, bool)
        mask2d[:P] = True

        match = gats_spg.match(state.params, {
            "descriptors2d_query": desc2d[None],
            "descriptors3d_db": db.descriptors3d[None],
            "descriptors2d_db": db.descriptors2d_db[None],
            "mask2d": mask2d[None],
            "mask3d": db.mask3d[None],
        }, cfg)
        n_matches = int((np.asarray(match.matches0[0]) >= 0).sum())
        assert n_matches >= P // 2, (trial, n_matches)

        res = pipeline.poses_from_matches(
            jnp.asarray(kpts2d[None]), jnp.asarray(mask2d[None]),
            match.matches0, jnp.asarray(db.keypoints3d),
            jnp.asarray(K, jnp.float32)[None],
            jax.random.split(jax.random.PRNGKey(trial), 1),
            num_hypotheses=128, refine_iters=3)
        evaluator.evaluate(
            np.asarray(res.pose[0])
            if bool(np.asarray(res.success)[0]) else None, pose_gt)

    metrics = evaluator.summarize(verbose=False)
    assert metrics["cmd5"] >= 5 / 6, metrics
    assert metrics["cmd1"] >= 4 / 6, metrics
