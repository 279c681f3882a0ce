"""End-to-end pipeline tests: the match→pose glue with synthetic perfect
matches (pose accuracy), and the full jitted frame→pose path (shape/jit
correctness with random weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onepose_tpu import pipeline
from onepose_tpu.datasets import anno
from onepose_tpu.models import gats_spg, superpoint
from onepose_tpu.utils import geometry as geo


def test_poses_from_matches_synthetic():
    """Known 2D-3D matches (with mismatches + padding) must recover GT pose
    per frame in the batch."""
    rng = np.random.default_rng(0)
    B, K, N2 = 3, 128, 256
    Kmat = np.array([[460.0, 0, 256], [0, 460.0, 256], [0, 0, 1]],
                    np.float32)
    pts3d = rng.uniform(-0.1, 0.1, (N2, 3)).astype(np.float32)

    kpts2d = np.zeros((B, K, 2), np.float32)
    matches0 = np.full((B, K), -1, np.int32)
    kpt_mask = np.zeros((B, K), bool)
    poses_gt = []
    for b in range(B):
        R = geo.rodrigues(rng.normal(size=3) * 0.5)
        t = np.array([0.01 * b, -0.02, 0.4 + 0.1 * b])
        pose = np.concatenate([R, t[:, None]], axis=1)
        poses_gt.append(pose)
        sel = rng.choice(N2, 100, replace=False)
        uv = geo.project_points(pts3d[sel], Kmat, pose)
        uv += rng.normal(size=uv.shape) * 0.5
        kpts2d[b, :100] = uv
        matches0[b, :100] = sel
        kpt_mask[b, :100] = True
        # 10 wrong matches
        matches0[b, 90:100] = rng.choice(N2, 10)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = pipeline.poses_from_matches(
        jnp.asarray(kpts2d), jnp.asarray(kpt_mask), jnp.asarray(matches0),
        jnp.asarray(pts3d), jnp.broadcast_to(jnp.asarray(Kmat), (B, 3, 3)),
        keys)
    for b in range(B):
        r_err, t_err = geo.query_pose_error(
            np.asarray(res.pose[b]), poses_gt[b])
        assert r_err < 0.5 and t_err < 0.5, (b, r_err, t_err)
        assert res.num_inliers[b] >= 80


@pytest.fixture(scope="module")
def tiny_pipeline():
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    sp_params = superpoint.init_params(key)
    gats_params = gats_spg.init_params(key)

    P, leaf, D = 40, 4, 256
    idxs = rng.integers(2, 10, P)
    total = int(idxs.sum())
    db = anno.build_object_db(
        avg_keypoints3d=rng.normal(size=(P, 3)).astype(np.float32),
        avg_descriptors3d=rng.normal(size=(D, P)).astype(np.float32),
        avg_scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32),
        clt_descriptors=rng.normal(size=(D, total)).astype(np.float32),
        clt_scores=rng.uniform(0, 1, (total, 1)).astype(np.float32),
        idxs=idxs, num_leaf=leaf, shape3d=48,
    )
    return pipeline.PosePipeline(
        sp_params, gats_params, db,
        sp_config={"max_keypoints": 64},
        num_hypotheses=32, refine_iters=2)


def test_full_pipeline_shapes(tiny_pipeline):
    rng = np.random.default_rng(2)
    B, H, W = 2, 64, 64
    images = rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)
    Ks = np.broadcast_to(
        np.array([[460.0, 0, 32], [0, 460.0, 32], [0, 0, 1]], np.float32),
        (B, 3, 3))
    out = tiny_pipeline(images, Ks)
    assert out.poses.shape == (B, 3, 4)
    assert out.num_inliers.shape == (B,)
    assert out.matches0.shape == (B, 64)
    assert np.isfinite(np.asarray(out.poses)).all()


def test_full_pipeline_deterministic(tiny_pipeline):
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
    Ks = np.array([[[460.0, 0, 32], [0, 460.0, 32], [0, 0, 1]]], np.float32)
    keys = jax.random.split(jax.random.PRNGKey(7), 1)
    out1 = tiny_pipeline(images, Ks, keys)
    out2 = tiny_pipeline(images, Ks, keys)
    np.testing.assert_array_equal(np.asarray(out1.poses),
                                  np.asarray(out2.poses))


def test_object_db_leaves():
    """Leaf assembly: counts >= num_leaf sample without replacement from the
    point's own observations; counts < num_leaf pad with dustbins."""
    rng = np.random.default_rng(4)
    D = 8
    idxs = np.array([2, 6, 4])
    total = int(idxs.sum())
    # give each observation a recognizable descriptor: obs j = j * ones
    clt_desc = np.tile(np.arange(1, total + 1, dtype=np.float32), (D, 1))
    leaf_desc, leaf_scores = anno.build_leaves(
        clt_desc, np.ones((total, 1), np.float32), idxs, num_leaf=4,
        rng=rng)
    leaf_ids = leaf_desc[:, 0].reshape(3, 4)  # recognizable first channel
    # point 0 (obs 1..2): two real + two dustbin (value 1.0 from ones pad)
    p0 = set(leaf_ids[0])
    assert p0 <= {1.0, 2.0}, p0
    # point 1 (obs 3..8): 4 distinct of its own
    p1 = leaf_ids[1]
    assert len(set(p1)) == 4 and set(p1) <= set(np.arange(3, 9, dtype=float))
    # point 2 (obs 9..12)
    p2 = leaf_ids[2]
    assert set(p2) <= set(np.arange(9, 13, dtype=float))
    # dustbin scores are 0
    assert (leaf_scores.reshape(3, 4)[0] == 0).sum() == 2


def test_pipeline_data_parallel_mesh_matches_single_device():
    """PosePipeline(mesh=...) must run the identical program SPMD over the
    virtual 8-device 'data' mesh: outputs equal the meshless pipeline."""
    from onepose_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    sp_params = superpoint.init_params(key)
    gats_params = gats_spg.init_params(key)
    P, leaf, D = 40, 4, 256
    idxs = rng.integers(2, 10, P)
    total = int(idxs.sum())
    db = anno.build_object_db(
        avg_keypoints3d=rng.normal(size=(P, 3)).astype(np.float32),
        avg_descriptors3d=rng.normal(size=(D, P)).astype(np.float32),
        avg_scores3d=rng.uniform(0, 1, (P, 1)).astype(np.float32),
        clt_descriptors=rng.normal(size=(D, total)).astype(np.float32),
        clt_scores=rng.uniform(0, 1, (total, 1)).astype(np.float32),
        idxs=idxs, num_leaf=leaf, shape3d=48,
    )
    kw = dict(sp_config={"max_keypoints": 64}, num_hypotheses=32,
              refine_iters=2)
    mesh = pmesh.make_mesh(8, (8, 1))
    pipe_mesh = pipeline.PosePipeline(sp_params, gats_params, db,
                                      mesh=mesh, **kw)
    pipe_one = pipeline.PosePipeline(sp_params, gats_params, db, **kw)

    B = 8
    images = rng.uniform(0, 1, (B, 64, 64, 1)).astype(np.float32)
    Ks = np.broadcast_to(np.array(
        [[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy()
    keys = jax.random.split(jax.random.PRNGKey(3), B)

    out_m = pipe_mesh(images, Ks, keys)
    out_1 = pipe_one(images, Ks, keys)
    np.testing.assert_allclose(np.asarray(out_m.poses),
                               np.asarray(out_1.poses), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_m.matches0),
                                  np.asarray(out_1.matches0))
    np.testing.assert_array_equal(np.asarray(out_m.success),
                                  np.asarray(out_1.success))
    # the mesh run really is sharded over 'data'
    assert len(out_m.poses.sharding.device_set) == 8
    jax.clear_caches()  # free the SPMD executables (suite memory budget)
