"""Training stack: focal-loss parity vs the reference formula, train-step
convergence, and data-parallel sharding on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp  # noqa: F401 (used throughout)

from onepose_tpu.models import gats_spg
from onepose_tpu.parallel import mesh as pmesh
from onepose_tpu.train import trainer
from onepose_tpu.train.loss import focal_loss


def test_focal_loss_reference_formula():
    torch = pytest.importorskip("torch")
    import conftest
    if not conftest.reference_available():
        pytest.skip("reference not present")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_focal", "/root/reference/src/losses/focal_loss.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 0.99, (2, 16, 24)).astype(np.float32)
    gt = (rng.uniform(size=(2, 16, 24)) < 0.1).astype(np.int32)

    ref = mod.FocalLoss(alpha=0.5, gamma=2, neg_weights=0.5,
                        pos_weights=0.5)
    expected = ref(torch.from_numpy(pred), torch.from_numpy(gt)).item()
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_focal_loss_empty_positive_set():
    pred = jnp.full((1, 4, 4), 0.3)
    gt = jnp.zeros((1, 4, 4), jnp.int32)
    val = focal_loss(pred, gt)
    assert np.isfinite(float(val))


def _tiny_batch(rng, b=4, n1=16, n2=8, leaf=2, d=256):
    def unit(x):
        return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(
            np.float32)

    # GT: first min(n1,n2) 2D kpts match 3D points 1:1
    conf_gt = np.zeros((b, n1, n2), np.int32)
    for i in range(min(n1, n2)):
        conf_gt[:, i, i] = 1
    d3 = unit(rng.normal(size=(b, n2, d)))
    # make 2D query descriptors noisy copies of their 3D matches
    n_match = min(n1, n2)
    d2 = unit(d3[:, :n_match] + 0.1 * rng.normal(size=(b, n_match, d)))
    pad = unit(rng.normal(size=(b, n1 - min(n1, n2), d)))
    return {
        "descriptors2d_query": np.concatenate([d2, pad], axis=1),
        "descriptors3d_db": d3,
        "descriptors2d_db": unit(rng.normal(size=(b, n2 * leaf, d))),
        "conf_gt": conf_gt,
    }


def test_train_step_reduces_loss():
    rng = np.random.default_rng(1)
    cfg = {"num_blocks": 1}
    tx = trainer.make_optimizer(base_lr=1e-4, grad_clip=0.5)
    state = trainer.init_train_state(jax.random.PRNGKey(0), tx, cfg)
    step = trainer.make_train_step(tx, cfg)

    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng).items()}
    losses = []
    for _ in range(20):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    """Same batch, 1-device vs 8-device data-parallel: identical loss."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    rng = np.random.default_rng(2)
    cfg = {"num_blocks": 1}
    tx = trainer.make_optimizer(base_lr=1e-4)
    step = trainer.make_train_step(tx, cfg)

    batch_np = _tiny_batch(rng, b=8)

    state1 = trainer.init_train_state(jax.random.PRNGKey(0), tx, cfg)
    state1, loss1 = step(state1, {k: jnp.asarray(v)
                                  for k, v in batch_np.items()})

    m = pmesh.make_mesh(8)
    state2 = trainer.init_train_state(jax.random.PRNGKey(0), tx, cfg)
    state2 = pmesh.replicate(m, state2)
    sharded = pmesh.shard_batch(m, batch_np)
    state2, loss2 = step(state2, sharded)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)

    # Gradients must agree tightly (the cross-device psum only reorders the
    # fp32 summation). Post-Adam params are NOT compared at tight tolerance:
    # rsqrt normalization amplifies last-ulp gradient differences to O(lr).
    from onepose_tpu.models import gats_spg

    full_cfg = dict(gats_spg.DEFAULT_CONFIG)
    full_cfg.update(cfg)
    grad_fn = jax.jit(
        lambda p, b: jax.grad(trainer.compute_loss)(p, b, full_cfg))
    params0 = trainer.init_train_state(jax.random.PRNGKey(0), tx,
                                       cfg).params

    def grads_of(batch):
        return grad_fn(params0, batch)

    g1 = grads_of({k: jnp.asarray(v) for k, v in batch_np.items()})
    g2 = grads_of(sharded)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6 + 1e-4 * scale)


def test_multistep_schedule():
    sched = trainer.multistep_schedule(1e-3, [10, 20], 0.5)
    assert np.isclose(sched(0), 1e-3)
    assert np.isclose(sched(10), 5e-4)
    assert np.isclose(sched(25), 2.5e-4)


@pytest.mark.slow
def test_remat_matches_standard():
    """remat=True must change memory, not math: identical loss + grads."""
    rng = np.random.default_rng(5)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng).items()}

    from onepose_tpu.models import gats_spg

    params = gats_spg.init_params(jax.random.PRNGKey(0), {"num_blocks": 1})

    def loss_fn(p, remat):
        cfg = dict(gats_spg.DEFAULT_CONFIG)
        cfg.update({"num_blocks": 1, "remat": remat})
        out = gats_spg.forward(p, batch, cfg)
        from onepose_tpu.train.loss import focal_loss

        return focal_loss(out.conf_matrix, batch["conf_gt"])

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_gather_path_matches_host_path(tmp_path):
    """The device-resident input path (leaf indices + on-device gather +
    conf_gt scatter) must reproduce the host-built dense batch exactly,
    tensor for tensor, given the same seed."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    from test_cli_integration import build_dataset

    from onepose_tpu.datasets.gats_dataset import GATsSPGDataset
    from onepose_tpu.datasets.merge import merge_anno

    rng = np.random.default_rng(4)
    build_dataset(tmp_path, rng)
    root = str(tmp_path)
    train_json = f"{root}/data/cache/t/train.json"
    merge_anno(f"{root}/data/sfm_model", ["0001-obj-box"], train_json)

    kw = dict(num_leaf=4, split="train", shape2d=24, shape3d=40, seed=5)
    ds_host = GATsSPGDataset(train_json, **kw)
    ds_light = GATsSPGDataset(train_json, **kw)

    host = next(ds_host.batches(2, shuffle=True, seed=7, num_threads=1))

    db_np, obj_index = ds_light.device_db()
    light = next(ds_light.light_batches(obj_index, db_np["t_max"], 2,
                                        shuffle=True, seed=7))
    db = {"clt_stack": jnp.asarray(db_np["clt_stack"]),
          "avg_stack": jnp.asarray(db_np["avg_stack"])}
    dev = trainer.materialize_light_batch(
        db, {k: jnp.asarray(v) for k, v in light.items()},
        shape2d=24, shape3d=40, pad_val=0)

    for k in ("descriptors2d_query", "descriptors3d_db",
              "descriptors2d_db", "conf_gt"):
        np.testing.assert_allclose(
            np.asarray(dev[k]), host[k], atol=0, rtol=0, err_msg=k)

    # and the jitted gather step itself runs + reduces loss
    tx = trainer.make_optimizer(base_lr=1e-3, milestones_steps=[100])
    state = trainer.init_train_state(
        jax.random.PRNGKey(0), tx, {"num_blocks": 1})
    step = trainer.make_gather_train_step(
        tx, {"num_blocks": 1}, db, 24, 40, 0)
    lb = {k: jnp.asarray(v) for k, v in light.items()}
    state, l0 = step(state, lb)
    for _ in range(4):
        state, l1 = step(state, lb)
    assert float(l1) < float(l0)


def test_on_device_leaf_sampling():
    """trainer.sample_leaves_on_device must be a valid without-replacement
    segment sampler: every pick lies inside its point's observation
    segment, picks are unique per point, points with fewer than num_leaf
    observations get exactly count real picks + dustbin padding — matching
    datasets.anno.sample_leaf_indices's semantics (which reproduce the
    reference's data_utils.py:163-205 leaf assembly)."""
    shape3d, num_leaf = 12, 4
    counts = np.array([0, 1, 3, 4, 9, 2, 7, 0, 5, 4, 1, 6], np.int64)
    total = int(counts.sum())
    t_max = total + 3  # padding rows beyond total, dustbin row index
    lower = np.cumsum(counts) - counts

    offsets = lower.astype(np.int32)

    for seed in (0, 1, 2):
        pick = np.asarray(trainer.sample_leaves_on_device(
            jnp.uint32(seed), jnp.asarray(counts), jnp.asarray(offsets),
            num_leaf, t_max))
        assert pick.shape == (shape3d, num_leaf)
        for p in range(shape3d):
            real = pick[p][pick[p] != t_max]
            assert len(real) == min(counts[p], num_leaf)
            assert len(np.unique(real)) == len(real)  # w/o replacement
            assert np.all((real >= lower[p]) & (real < lower[p] + counts[p]))

    # different seeds give different samples (point 4 has C(9,4) choices)
    p0 = np.asarray(trainer.sample_leaves_on_device(
        jnp.uint32(0), jnp.asarray(counts), jnp.asarray(offsets),
        num_leaf, t_max))
    p1 = np.asarray(trainer.sample_leaves_on_device(
        jnp.uint32(1), jnp.asarray(counts), jnp.asarray(offsets),
        num_leaf, t_max))
    assert not np.array_equal(p0, p1)


def test_gather_step_with_device_leaf_sampling(tmp_path):
    """End-to-end: light batches shipping only a leaf_seed drive the jitted
    gather step; the materialized batch equals the leaf_idx path when the
    same picks are replayed, and training reduces the loss."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    from test_cli_integration import build_dataset

    from onepose_tpu.datasets.gats_dataset import GATsSPGDataset
    from onepose_tpu.datasets.merge import merge_anno

    rng = np.random.default_rng(4)
    build_dataset(tmp_path, rng)
    root = str(tmp_path)
    train_json = f"{root}/data/cache/t/train.json"
    merge_anno(f"{root}/data/sfm_model", ["0001-obj-box"], train_json)

    kw = dict(num_leaf=4, split="train", shape2d=24, shape3d=40, seed=5)
    ds = GATsSPGDataset(train_json, **kw)
    db_np, obj_index = ds.device_db()
    light = next(ds.light_batches(obj_index, db_np["t_max"], 2,
                                  shuffle=True, seed=7,
                                  on_device_leaves=True))
    assert "leaf_seed" in light and "leaf_idx" not in light

    db = {k: jnp.asarray(db_np[k]) for k in
          ("clt_stack", "avg_stack", "count_stack", "offset_stack")}
    lb = {k: jnp.asarray(v) for k, v in light.items()}
    dev = trainer.materialize_light_batch(db, lb, shape2d=24, shape3d=40,
                                          pad_val=0, num_leaf=4)

    # consistency: replaying the sampled picks through the leaf_idx path
    # gives the identical materialized batch
    dustbin = db_np["clt_stack"].shape[1] - 1
    picks = np.stack([np.asarray(trainer.sample_leaves_on_device(
        jnp.uint32(s), db["count_stack"][int(o)],
        db["offset_stack"][int(o)], 4, dustbin))
        for s, o in zip(light["leaf_seed"], light["obj_idx"])])
    light_idx = {k: v for k, v in light.items() if k != "leaf_seed"}
    light_idx["leaf_idx"] = picks.reshape(2, -1).astype(np.int32)
    dev2 = trainer.materialize_light_batch(
        db, {k: jnp.asarray(v) for k, v in light_idx.items()},
        shape2d=24, shape3d=40, pad_val=0, num_leaf=4)
    for k in dev:
        np.testing.assert_array_equal(
            np.asarray(dev[k]), np.asarray(dev2[k]), err_msg=k)

    tx = trainer.make_optimizer(base_lr=1e-3, milestones_steps=[100])
    state = trainer.init_train_state(
        jax.random.PRNGKey(0), tx, {"num_blocks": 1})
    step = trainer.make_gather_train_step(
        tx, {"num_blocks": 1}, db, 24, 40, 0, num_leaf=4)
    state, l0 = step(state, lb)
    for _ in range(4):
        state, l1 = step(state, lb)
    assert float(l1) < float(l0)


def test_light_batch_saturated_budgets_no_corner_corruption():
    """Regression: when an item saturates BOTH budgets (num2d==shape2d and
    num3d==shape3d), the pad scatter must not corrupt conf_gt — a -1 pad
    pair wraps to the (shape2d-1, shape3d-1) corner (JAX normalizes
    negative indices before the mode="drop" OOB check), planting a
    spurious GT positive exactly where the pad_region mask no longer
    hides it."""
    s2, s3, n_pairs = 8, 10, 3
    pairs = np.full((16, 2), (s2, s3), np.int32)
    pairs[:n_pairs] = [[0, 1], [2, 3], [4, 5]]
    light = {
        "pairs": jnp.asarray(pairs[None]),
        "descriptors2d_query": jnp.zeros((1, s2, 4), jnp.float32),
        "obj_idx": jnp.zeros((1,), jnp.int32),
        "leaf_idx": jnp.zeros((1, s3 * 2), jnp.int32),
        "num2d": jnp.full((1,), s2, jnp.int32),   # saturated
        "num3d": jnp.full((1,), s3, jnp.int32),   # saturated
    }
    db = {"clt_stack": jnp.ones((1, 5, 4), jnp.float32),
          "avg_stack": jnp.zeros((1, s3, 4), jnp.float32)}
    dev = trainer.materialize_light_batch(db, light, shape2d=s2,
                                          shape3d=s3, pad_val=0,
                                          num_leaf=2)
    conf = np.asarray(dev["conf_gt"])[0]
    assert conf.sum() == n_pairs
    assert conf[s2 - 1, s3 - 1] == 0  # the corner the -1 pad would hit


def test_dataset_light_pairs_pad_out_of_bounds(tmp_path):
    """GATsSPGDataset.get_light must pad pairs with (shape2d, shape3d),
    never -1 (see test above for why)."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    from test_cli_integration import build_dataset

    from onepose_tpu.datasets.gats_dataset import GATsSPGDataset
    from onepose_tpu.datasets.merge import merge_anno

    rng = np.random.default_rng(4)
    build_dataset(tmp_path, rng)
    root = str(tmp_path)
    train_json = f"{root}/data/cache/t/train.json"
    merge_anno(f"{root}/data/sfm_model", ["0001-obj-box"], train_json)

    ds = GATsSPGDataset(train_json, num_leaf=4, split="train",
                        shape2d=24, shape3d=40, seed=5)
    db_np, obj_index = ds.device_db()
    item = ds.get_light(0, obj_index, db_np["t_max"],
                        np.random.default_rng(0))
    pairs = item["pairs"]
    pad = pairs[(pairs[:, 0] >= 24) | (pairs[:, 1] >= 40)]
    assert pad.size > 0 and np.all(pad == [24, 40])
    assert np.all(pairs >= 0)
