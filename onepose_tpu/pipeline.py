"""Fused frame→pose inference pipeline.

The reference inference loop round-trips GPU↔CPU four times per frame
(extract → .cpu() → pack → .cuda() → match → .cpu() → OpenCV PnP,
/root/reference/inference.py:132-155). Here the whole path — SuperPoint
extraction, GATsSPG 2D-3D matching, match gathering, RANSAC-EPnP — is one
jitted, batched computation: frames go in, poses come out, nothing leaves HBM
in between.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onepose_tpu.datasets.anno import ObjectDB
from onepose_tpu.models import gats_spg, superpoint
from onepose_tpu.ops import epnp


class PoseOutput(NamedTuple):
    poses: jnp.ndarray         # [B, 3, 4] world→camera
    num_inliers: jnp.ndarray   # [B] int32
    num_matches: jnp.ndarray   # [B] int32
    success: jnp.ndarray       # [B] bool
    matches0: jnp.ndarray      # [B, K] int32 (3D indices, -1 invalid)
    keypoints2d: jnp.ndarray   # [B, K, 2]
    descriptors2d: jnp.ndarray  # [B, K, D] query descriptors (for trackers)
    kpt_mask: jnp.ndarray      # [B, K] valid-keypoint mask


def poses_from_matches(keypoints2d: jnp.ndarray, kpt_mask: jnp.ndarray,
                       matches0: jnp.ndarray, keypoints3d: jnp.ndarray,
                       Ks: jnp.ndarray, keys: jax.Array,
                       reproj_threshold: float = 5.0,
                       num_hypotheses: int = 512,
                       refine_iters: int = 5):
    """Batched match→pose glue: gather matched 3D points and run on-device
    RANSAC-EPnP per frame.

    keypoints2d: [B, K, 2]; kpt_mask: [B, K]; matches0: [B, K] (-1 = no
    match); keypoints3d: [N2, 3] (shared) or [B, N2, 3]; Ks: [B, 3, 3];
    keys: [B] PRNG keys.
    """
    if keypoints3d.ndim == 2:
        keypoints3d = jnp.broadcast_to(
            keypoints3d[None], (keypoints2d.shape[0],) + keypoints3d.shape)

    def solve_one(kpts2d, mask, m0, kpts3d, K, key):
        valid = (m0 >= 0) & mask
        mkpts3d = kpts3d[jnp.clip(m0, 0)]
        return epnp.ransac_pnp(
            key, kpts2d, mkpts3d, valid, K,
            reproj_threshold=reproj_threshold,
            num_hypotheses=num_hypotheses,
            refine_iters=refine_iters)

    return jax.vmap(solve_one)(
        keypoints2d, kpt_mask, matches0, keypoints3d, Ks, keys)


@functools.partial(
    jax.jit,
    static_argnames=("sp_config_items", "gats_config_items",
                     "num_hypotheses", "refine_iters", "reproj_threshold",
                     "use_pallas_match"),
)
def _frame_to_pose_jit(sp_params, gats_params, db, images, Ks, keys,
                       sp_config_items, gats_config_items,
                       reproj_threshold, num_hypotheses, refine_iters,
                       use_pallas_match=False):
    sp_cfg = dict(sp_config_items)
    b = images.shape[0]

    det = superpoint.extract(sp_params, images, sp_cfg)

    n2 = db["descriptors3d"].shape[0]
    data = {
        "descriptors2d_query": det.descriptors,
        "descriptors3d_db": jnp.broadcast_to(
            db["descriptors3d"][None], (b, n2, db["descriptors3d"].shape[1])),
        "descriptors2d_db": jnp.broadcast_to(
            db["descriptors2d_db"][None],
            (b,) + db["descriptors2d_db"].shape),
        "mask2d": det.mask,
        "mask3d": jnp.broadcast_to(db["mask3d"][None], (b, n2)),
    }
    match_fn = (gats_spg.forward_match_only if use_pallas_match
                else gats_spg.forward)
    match = match_fn(gats_params, data, dict(gats_config_items))

    pnp = poses_from_matches(
        det.keypoints, det.mask, match.matches0, db["keypoints3d"], Ks, keys,
        reproj_threshold=reproj_threshold, num_hypotheses=num_hypotheses,
        refine_iters=refine_iters)

    return PoseOutput(
        poses=pnp.pose,
        num_inliers=pnp.num_inliers,
        num_matches=jnp.sum(match.matches0 >= 0, axis=1).astype(jnp.int32),
        success=pnp.success,
        matches0=match.matches0,
        keypoints2d=det.keypoints,
        descriptors2d=det.descriptors,
        kpt_mask=det.mask,
    )


class PosePipeline:
    """One object's end-to-end pose estimator: holds device-resident model
    params + the static 3D descriptor DB, exposes a batched frame→pose call.

    Mirrors the role of the reference's inference_core per-frame loop
    (inference.py:97-182) but batched and fully on-device.
    """

    def __init__(self, sp_params, gats_params, db: ObjectDB,
                 sp_config: Optional[dict] = None,
                 gats_config: Optional[dict] = None,
                 reproj_threshold: float = 5.0,
                 num_hypotheses: int = 512,
                 refine_iters: int = 5,
                 use_pallas_match: bool = False,
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis —
        params are replicated and each call's frame batch is sharded over
        'data', so XLA runs the whole frame→pose program data-parallel
        across the mesh (the data-axis size must divide the batch).

        When the mesh also has a 'model' axis of size > 1, the 3D DB is
        sharded over it along the 3D-token axis (descriptors3d
        [N2, D] → P('model', None), the leaf descriptors and mask
        likewise) whenever N2 divides the axis; the GATs/SuperGlue
        attention then runs model-parallel over the 3D tokens with XLA
        inserting the collectives, and the PnP gather all-gathers the
        (small) keypoints3d. Non-divisible shapes fall back to
        replication — same math either way (pinned by
        tests/test_mp4.py::test_full_pipeline_mp4_pose_equality).
        """
        self.mesh = mesh
        n_model = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P("data"))
            put = lambda t: jax.device_put(t, rep)  # noqa: E731
            n_model = dict(mesh.shape).get("model", 1)

            def put_db(t):
                t = jnp.asarray(t)
                if n_model > 1 and t.shape[0] % n_model == 0:
                    spec = P("model", *([None] * (t.ndim - 1)))
                    return jax.device_put(t, NamedSharding(mesh, spec))
                return put(t)
        else:
            put = jnp.asarray
            put_db = jnp.asarray
        self.sp_params = jax.tree.map(put, sp_params)
        self.gats_params = jax.tree.map(put, gats_params)
        self.db = {
            "keypoints3d": put_db(db.keypoints3d),
            "descriptors3d": put_db(db.descriptors3d),
            "descriptors2d_db": put_db(db.descriptors2d_db),
            "mask3d": put_db(db.mask3d),
        }
        sp_cfg = dict(superpoint.DEFAULT_CONFIG)
        sp_cfg.update(sp_config or {})
        sp_cfg = superpoint.resolve_fused_stem(sp_cfg)
        gats_cfg = dict(gats_spg.DEFAULT_CONFIG)
        gats_cfg.update(gats_config or {})
        self.sp_config_items = tuple(sorted(sp_cfg.items()))
        self.gats_config_items = tuple(sorted(gats_cfg.items()))
        self.reproj_threshold = reproj_threshold
        self.num_hypotheses = num_hypotheses
        self.refine_iters = refine_iters
        self.use_pallas_match = use_pallas_match

    def __call__(self, images, Ks, keys=None) -> PoseOutput:
        """images: [B, H, W, 1] float32 in [0,1]; Ks: [B, 3, 3];
        keys: [B] PRNG keys (defaults to a fixed seed per batch)."""
        images = jnp.asarray(images, jnp.float32)
        Ks = jnp.asarray(Ks, jnp.float32)
        if keys is None:
            keys = jax.random.split(
                jax.random.PRNGKey(12345), images.shape[0])
        if self.mesh is not None:
            s = self._batch_sharding
            images = jax.device_put(images, s)
            Ks = jax.device_put(Ks, s)
            keys = jax.device_put(jnp.asarray(keys), s)
        return _frame_to_pose_jit(
            self.sp_params, self.gats_params, self.db, images, Ks, keys,
            self.sp_config_items, self.gats_config_items,
            self.reproj_threshold, self.num_hypotheses, self.refine_iters,
            self.use_pallas_match)
