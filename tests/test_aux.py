"""Aux subsystems: global BA on a model dir, collectives (single-process
degradation), profiling utils."""
import numpy as np

from onepose_tpu.parallel import collectives
from onepose_tpu.sfm import global_ba
from onepose_tpu.utils import colmap_io
from onepose_tpu.utils.profiling import Timer


def test_global_ba_refines_model(tmp_path):
    # reuse the synthetic SfM scene: build a model with perturbed poses
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(__file__))
    from test_sfm import make_scene

    from onepose_tpu.utils.geometry import rotmat2qvec, qvec2rotmat

    rng = np.random.default_rng(0)
    pts3d, K, poses, uvs, perms = make_scene(rng, n_points=30, n_cams=6,
                                             noise_px=0.0)
    cameras, images, points = {}, {}, {}
    for i, pose in enumerate(poses):
        cameras[i + 1] = colmap_io.Camera(
            i + 1, "PINHOLE", 512, 512,
            np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]))
        R = pose[:3, :3]
        # perturb the stored poses
        from onepose_tpu.utils.geometry import rodrigues

        R_p = rodrigues(rng.normal(size=3) * 0.005) @ R
        t_p = pose[:3, 3] + rng.normal(size=3) * 0.002
        images[i + 1] = colmap_io.Image(
            i + 1, rotmat2qvec(R_p), t_p, i + 1, f"img{i}.png",
            uvs[i].astype(np.float64),
            np.full(len(uvs[i]), -1, np.int64))
    inv_perms = [np.argsort(p) for p in perms]
    for pi in range(len(pts3d)):
        image_ids = np.arange(1, len(poses) + 1, dtype=np.int32)
        pt2d = np.array([inv_perms[c][pi] for c in range(len(poses))],
                        np.int32)
        points[pi + 1] = colmap_io.Point3D(
            pi + 1, pts3d[pi], np.zeros(3, np.uint8), 0.0, image_ids,
            pt2d)
        for c in range(len(poses)):
            images[c + 1].point3D_ids[pt2d[c]] = pi + 1

    model_dir = str(tmp_path / "model")
    colmap_io.write_model(cameras, images, points, model_dir)

    stats = global_ba.run_bundle_adjuster(model_dir, iterations=10)
    assert stats["final_cost"] < stats["initial_cost"] * 0.01

    # poses in the refreshed model reproject cleanly
    _, images2, points2 = colmap_io.read_model(model_dir)
    im = images2[1]
    R = qvec2rotmat(im.qvec)
    errs = []
    for pid, pt in points2.items():
        sel = pt.image_ids == 1
        if sel.any():
            ki = int(pt.point2D_idxs[sel][0])
            cam = R @ pt.xyz + im.tvec
            uv = (K @ cam)[:2] / cam[2]
            errs.append(np.linalg.norm(uv - im.xys[ki]))
    assert np.median(errs) < 0.5


def test_collectives_single_process():
    assert collectives.get_world_size() == 1
    assert collectives.is_main_process()
    collectives.synchronize()  # no-op
    out = collectives.reduce_dict({"a": 1.0, "b": 2.0})
    assert out == {"a": 1.0, "b": 2.0}
    g = collectives.all_gather_arrays({"x": np.ones(3)})
    assert g["x"].shape == (1, 3)


def test_timer():
    t = Timer()
    with t.scope("op"):
        x = sum(range(1000))
    t.tick("op")
    t.tock("op")
    s = t.summary()
    assert s["op"]["count"] == 2
    assert s["op"]["total_s"] >= 0


def test_wandb_adapter_with_fake_module(tmp_path, monkeypatch):
    """The wandb adapter mirrors metrics and checkpoint artifacts when the
    package exists (faked here; it doesn't ship in this image) and is a
    silent no-op otherwise."""
    import sys
    import types

    calls = {"logs": [], "artifacts": [], "finished": [0]}

    class FakeArtifact:
        def __init__(self, name, type):
            self.name, self.type, self.items = name, type, []

        def add_dir(self, p):
            self.items.append(("dir", p))

        def add_file(self, p):
            self.items.append(("file", p))

    class FakeRun:
        id = "r1"

        def log(self, metrics, step=None):
            calls["logs"].append((step, metrics))

        def log_artifact(self, art):
            calls["artifacts"].append(art)

        def finish(self):
            calls["finished"][0] += 1

    fake = types.ModuleType("wandb")
    fake.init = lambda project, config: FakeRun()
    fake.Artifact = FakeArtifact
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from onepose_tpu.train.logging import MetricLogger, WandbAdapter

    logger = MetricLogger(str(tmp_path), use_tensorboard=False,
                          wandb_project="proj", wandb_config={"a": 1})
    logger.log(3, {"loss": 0.5})
    ck = tmp_path / "ck"
    ck.mkdir()
    logger.log_checkpoint(str(ck))
    logger.close()
    assert calls["logs"] == [(3, {"loss": 0.5})]
    assert len(calls["artifacts"]) == 1
    assert calls["artifacts"][0].items == [("dir", str(ck))]
    assert calls["finished"][0] == 1

    # without the module: every call a no-op
    monkeypatch.delitem(sys.modules, "wandb")
    ad = WandbAdapter("proj")
    ad.log(0, {"x": 1.0})
    ad.log_checkpoint(str(ck))
    ad.finish()


def test_classification_heatmaps(tmp_path):
    """F1/precision/recall + confusion-matrix callback equivalent
    (reference wandb_callbacks.py:85-186): accumulation, sklearn-parity
    per-class scores, PNG emission, reset."""
    from onepose_tpu.train.callbacks import ClassificationHeatmaps

    hm = ClassificationHeatmaps(["a", "b", "c"])
    hm.update([0, 1, 1, 2, 2, 2], [0, 1, 0, 2, 2, 1])
    hm.update([0], [1])

    cm = hm.confusion_matrix()
    # rows=target, cols=pred
    assert cm.sum() == 7
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 2] == 2
    assert cm[0, 1] == 1 and cm[1, 2] == 1 and cm[1, 0] == 1

    s = hm.scores()
    # class a: tp=1, pred_tot=2, targ_tot=2 -> p=r=f1=0.5
    np.testing.assert_allclose(s["precision"][0], 0.5)
    np.testing.assert_allclose(s["recall"][0], 0.5)
    np.testing.assert_allclose(s["f1"][0], 0.5)
    # class c: tp=2, pred_tot=3, targ_tot=2
    np.testing.assert_allclose(s["precision"][2], 2 / 3)
    np.testing.assert_allclose(s["recall"][2], 1.0)

    try:
        import sklearn.metrics as skm

        p = np.concatenate(hm.preds)
        t = np.concatenate(hm.targets)
        np.testing.assert_allclose(
            s["f1"], skm.f1_score(t, p, average=None, labels=[0, 1, 2]))
        np.testing.assert_allclose(
            s["precision"],
            skm.precision_score(t, p, average=None, labels=[0, 1, 2]))
        np.testing.assert_allclose(
            s["recall"],
            skm.recall_score(t, p, average=None, labels=[0, 1, 2]))
    except ImportError:
        pass

    flat = hm.emit(epoch=3, plot_dir=str(tmp_path))
    assert flat["val_recall/c"] == 1.0
    import os.path as osp
    assert osp.exists(osp.join(str(tmp_path), "heatmaps_epoch3.png"))
    assert hm.preds == [] and hm.targets == []  # reset


def test_match_classification_labels():
    from onepose_tpu.train.callbacks import match_classification_labels

    kpts2d = np.array([[10.0, 10], [50, 50], [90, 90], [120, 120]])
    gt_proj = np.array([[11.0, 10], [80, 80], [90, 91]])
    valid3d = np.array([True, True, False])
    # kpt0 matched to pt0 (1px -> correct); kpt1 matched to pt1 (wrong,
    # 42px); kpt2 unmatched but pt2 is invalid -> target 0; kpt3 masked out
    matches0 = np.array([0, 1, -1, 0])
    kpt_mask = np.array([True, True, True, False])
    pred, targ = match_classification_labels(
        matches0, kpt_mask, kpts2d, gt_proj, valid3d)
    np.testing.assert_array_equal(pred, [1, 2, 0])
    np.testing.assert_array_equal(targ, [1, 0, 0])


def test_model_watcher():
    from onepose_tpu.train.callbacks import ModelWatcher, param_norms

    params = {"enc": {"w": np.ones((2, 2))}, "dec": {"w": np.full(4, 2.0)}}
    norms = param_norms(params)
    np.testing.assert_allclose(norms["params_norm/enc"], 2.0)
    np.testing.assert_allclose(norms["params_norm/dec"], 4.0)

    logged = []

    class FakeLogger:
        def log(self, step, metrics):
            logged.append((step, metrics))

    w = ModelWatcher(FakeLogger(), log_freq=2)
    w.step(1, params)
    w.step(2, params)
    assert len(logged) == 1 and logged[0][0] == 2


def test_unfreeze_after():
    """unfreeze_after zeroes frozen-leaf updates until the step threshold,
    then passes them through (UnfreezeModelCallback role)."""
    import jax.numpy as jnp
    import optax

    from onepose_tpu.train import callbacks

    params = {"frozen": jnp.ones(3), "live": jnp.ones(2)}
    mask = {"frozen": True, "live": False}
    tx = optax.chain(optax.sgd(1.0), callbacks.unfreeze_after(2, mask))
    state = tx.init(params)
    grads = {"frozen": jnp.full(3, 0.5), "live": jnp.full(2, 0.5)}

    p = params
    for step in range(4):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
        if step < 2:
            np.testing.assert_array_equal(np.asarray(p["frozen"]),
                                          np.ones(3))
        else:
            assert float(p["frozen"][0]) < 1.0
    # live leaf trained from step 0: 4 sgd steps of -0.5 each
    np.testing.assert_allclose(np.asarray(p["live"]), np.ones(2) - 2.0)
    # frozen leaf trained only for the last 2 steps
    np.testing.assert_allclose(np.asarray(p["frozen"]), np.ones(3) - 1.0)


def test_unfreeze_after_prefix_mask():
    """A genuinely shallower prefix mask (one bool per SUBTREE) must work:
    the docstring promises optax.masked-style pytree-prefix semantics, and a
    plain tree.map over (updates, mask) would raise a structure error here
    (ADVICE r4 medium)."""
    import jax.numpy as jnp
    import optax

    from onepose_tpu.train import callbacks

    params = {"backbone": {"w": jnp.ones(3), "b": jnp.ones(1)},
              "head": {"w": jnp.ones(2)}}
    # True at the 'backbone' NODE freezes its whole subtree.
    mask = {"backbone": True, "head": False}
    tx = optax.chain(callbacks.unfreeze_after(2, mask), optax.sgd(1.0))
    state = tx.init(params)
    grads = {"backbone": {"w": jnp.full(3, 0.5), "b": jnp.full(1, 0.5)},
             "head": {"w": jnp.full(2, 0.5)}}

    p = params
    for _ in range(4):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    np.testing.assert_allclose(np.asarray(p["head"]["w"]), np.ones(2) - 2.0)
    np.testing.assert_allclose(np.asarray(p["backbone"]["w"]),
                               np.ones(3) - 1.0)
    np.testing.assert_allclose(np.asarray(p["backbone"]["b"]),
                               np.ones(1) - 1.0)


def test_unfreeze_after_no_momentum_kick():
    """Placed BEFORE the inner optimizer (documented recommended order),
    frozen leaves feed zero gradients into momentum during the frozen phase,
    so the first post-unfreeze step carries no stale-momentum kick — the
    reference's requires_grad=False behavior (ADVICE r4 low)."""
    import jax.numpy as jnp
    import optax

    from onepose_tpu.train import callbacks

    params = {"frozen": jnp.ones(1), "live": jnp.ones(1)}
    mask = {"frozen": True, "live": False}
    # Momentum-heavy inner optimizer to make a stale kick visible.
    tx = optax.chain(callbacks.unfreeze_after(3, mask),
                     optax.sgd(1.0, momentum=0.9))
    state = tx.init(params)
    grads = {"frozen": jnp.full(1, 1.0), "live": jnp.full(1, 1.0)}

    p = params
    deltas = []
    for _ in range(4):
        updates, state = tx.update(grads, state, p)
        deltas.append(float(updates["frozen"][0]))
        p = optax.apply_updates(p, updates)
    # Frozen phase: exactly zero updates (no momentum accumulation).
    assert deltas[:3] == [0.0, 0.0, 0.0]
    # First live step: plain -lr*grad, NOT amplified by accumulated momentum.
    np.testing.assert_allclose(deltas[3], -1.0, rtol=1e-6)
