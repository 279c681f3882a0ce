"""Keyframe BA tracker.

Capability match for the reference ``BATracker``
(/root/reference/src/tracker/ba_tracker.py, 802 LoC, DeepLM C++/CUDA BA):
video pose tracking that maintains a keyframe window, initializes each query
pose from pyramidal LK flow (or constant-velocity motion prediction when flow
fails), extends 2D-3D assignments by descriptor matching with reprojection
gating, triangulates newly observed points, and refines the window with
bundle adjustment.

TPU-native redesign: every compute stage is a jitted static-shape kernel —
LK flow (ops.lk_flow), mutual-NN matching (models.nn_matcher), RANSAC-EPnP
(ops.epnp), windowed Schur-LM BA (ops.lm) — orchestrated by a small host
state machine (the reference keeps the same split: Python state + native
solvers).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from onepose_tpu.models.nn_matcher import mutual_nearest_neighbour
from onepose_tpu.ops import epnp, lie, lk_flow, lm
from onepose_tpu.utils.geometry import query_pose_error


# ---------------------------------------------------------------------------
# Fused per-frame kernels. Everything is static-shape (full keypoint slots +
# masks, never host-compacted index subsets) so each tracked frame costs a
# fixed number of dispatches with NO retracing — the naive per-subset calls
# recompile for every distinct match count, which dominates latency.
# ---------------------------------------------------------------------------

def _tri_two_view(uv0, uv1, P0, P1):
    """Two-view DLT triangulation for every keyframe slot, TPU-shaped.

    Inhomogeneous form: with X = [x, y, z, 1], the four row-normalized
    DLT rows give a 3-unknown least-squares system solved by the analytic
    3x3 inverse — no 4x4 ``jnp.linalg.eigh`` (whose QR while_loop would
    serialize inside the fused step; docs/DESIGN.md §2). Points at
    infinity (w≈0) are outside the tracker's depth gate anyway.

    uv0/uv1: [N, 2] pixel obs; P0/P1: [3, 4] projection matrices
    (K[R|t]). Returns (xyz [N, 3], err [N, 2] reproj px, z [N, 2]).
    """
    def rows(uv, P):
        r0 = uv[:, 0:1] * P[2][None] - P[0][None]       # [N, 4]
        r1 = uv[:, 1:2] * P[2][None] - P[1][None]
        r0 = r0 / (jnp.linalg.norm(r0, axis=1, keepdims=True) + 1e-12)
        r1 = r1 / (jnp.linalg.norm(r1, axis=1, keepdims=True) + 1e-12)
        return r0, r1

    a0, a1 = rows(uv0, P0)
    b0, b1 = rows(uv1, P1)
    A = jnp.stack([a0, a1, b0, b1], axis=1)             # [N, 4, 4]
    M = A[:, :, :3]
    rhs = -A[:, :, 3]
    AtA = jnp.einsum("nri,nrj->nij", M, M,
                     preferred_element_type=jnp.float32)
    Atb = jnp.einsum("nri,nr->ni", M, rhs,
                     preferred_element_type=jnp.float32)
    AtA = AtA + 1e-10 * jnp.eye(3, dtype=AtA.dtype)
    xyz = jnp.einsum("nij,nj->ni", jax.vmap(epnp._inv3)(AtA), Atb)

    xyz_h = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], axis=1)
    proj0 = xyz_h @ P0.T                                # [N, 3]
    proj1 = xyz_h @ P1.T
    z = jnp.stack([proj0[:, 2], proj1[:, 2]], axis=1)
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    e0 = jnp.linalg.norm(proj0[:, :2] / zs[:, 0:1] - uv0, axis=1)
    e1 = jnp.linalg.norm(proj1[:, :2] / zs[:, 1:2] - uv1, axis=1)
    return xyz, jnp.stack([e0, e1], axis=1), z


def _img_unit_f32(img):
    """Device-side image normalization for the fused kernels.

    uint8 frames upload 1 byte/px (4x less tunnel/PCIe traffic — upload
    was 32.5 ms of the 150 ms/frame r5 budget, DESIGN §10b) and convert
    on chip; ``u.astype(f32) / 255`` on device is bit-identical to the
    host-side ``np.float32(u) / 255`` a caller would otherwise do, since
    every uint8 value is exact in f32 and f32 division is IEEE on both.
    float frames pass through unchanged (already [0, 1])."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / jnp.float32(255.0)
    return img.astype(jnp.float32)


def _pack_f32(vals):
    """Concatenate a list of arrays/scalars into ONE flat f32 vector.

    On the tunneled backend every host fetch is a full HTTP round trip
    (~25 ms, DESIGN §8); fetching a multi-leaf output tuple leaf-by-leaf
    made the tracker RTT-bound (11 leaves ≈ 275 ms/frame — the r5
    breakdown's unaccounted gap, measurements/tracker_breakdown_r5.json).
    All packed values are exact in f32: indices/counts < 2^24, bools 0/1,
    geometry already f32."""
    return jnp.concatenate(
        [jnp.ravel(v).astype(jnp.float32) for v in vals])


@functools.partial(jax.jit, static_argnames=("num_hypotheses",
                                             "gate_scale"))
def _track_step(kf_img, q_img, kf_kpts, kf_desc, kf_mask, kf_src_ok,
                kf_pts3d, q_kpts, q_desc, q_mask, pose_motion, has_motion,
                K, kf_P, key, num_hypotheses, gate_scale):
    """The whole per-frame compute — LK flow → flow-PnP → flow-vs-motion
    fallback → descriptor association → reprojection gating → PnP →
    two-view triangulation of newly observed points — in ONE dispatch
    with one host sync.

    kf_src_ok: [Kf] keyframe slots that carry a 3D id; kf_pts3d their 3D
    points (garbage where ~kf_src_ok). pose_motion/has_motion: the
    constant-velocity fallback (identity + False when no history).
    kf_P: [3, 4] the keyframe's K @ pose projection matrix (for the
    fused triangulation of unassigned KF↔query matches — previously a
    separate dispatch+fetch round trip per tracked frame).
    Returns ONE packed f32 vector (see _pack_f32 / _unpack_track) holding
    (pose, m0 [Kf]→query, keep [Kq] gated assignment mask, n_keep,
    pnp_inliers, used_pnp, flow_ok, flow_inliers, have_init,
    tri_xyz [Kf, 3], tri_good [Kf]) — one host fetch per frame instead
    of eleven.
    Semantics match the previous two-kernel host flow (median*scale
    gate, floor 3 px, stages skipped below 8 correspondences; the
    reference's triangulation culling err<3px, 0.01<z<10,
    ba_tracker.py:546-584)."""
    key_flow, key_pnp = jax.random.split(key)

    # images arrive uint8 (compact upload) or f32; LK runs in f32 [0, 1]
    kf_img = _img_unit_f32(kf_img)
    q_img = _img_unit_f32(q_img)

    # pose init: LK flow + PnP on the flowed 2D ↔ known 3D, falling back
    # to the motion prediction on-device
    res = lk_flow.pyramid_lk(kf_img, q_img, kf_kpts)
    status = res.status & kf_src_ok
    fpnp = epnp.ransac_pnp(key_flow, res.points, kf_pts3d, status, K,
                           num_hypotheses=num_hypotheses)
    flow_ok = fpnp.success & (jnp.sum(status) >= 8)
    pose_init = jnp.where(flow_ok, fpnp.pose, pose_motion)
    have_init = flow_ok | has_motion

    nq = q_desc.shape[0]
    nn = mutual_nearest_neighbour(kf_desc, q_desc, mask0=kf_mask,
                                  mask1=q_mask, distance_thresh=0.7)
    m0 = nn.matches0
    src_ok = (m0 >= 0) & kf_src_ok
    # Sentinel must be genuinely out of bounds: JAX normalizes negative
    # indices BEFORE the mode="drop" OOB check, so -1 would scatter into
    # slot nq-1 (spurious assignment + garbage 3D point there). nq drops.
    tgt = jnp.where(src_ok, m0, nq)
    assigned_q = jnp.zeros(nq, bool).at[tgt].set(True, mode="drop")
    pts3d_q = jnp.zeros((nq, 3), jnp.float32).at[tgt].set(
        kf_pts3d.astype(jnp.float32), mode="drop")

    proj = lie.project(pose_init, K, pts3d_q)
    err = jnp.linalg.norm(proj - q_kpts, axis=1)
    errs = jnp.where(assigned_q, err, jnp.inf)
    cnt = jnp.sum(assigned_q)
    s = jnp.sort(errs)
    med = 0.5 * (s[jnp.maximum((cnt - 1) // 2, 0)]
                 + s[jnp.maximum(cnt // 2, 0)])
    gate = jnp.maximum(med * gate_scale, 3.0)
    keep = jnp.where(cnt >= 8, assigned_q & (err <= gate), assigned_q)

    pnp = epnp.ransac_pnp(key_pnp, q_kpts, pts3d_q, keep, K,
                          num_hypotheses=num_hypotheses)
    n_keep = jnp.sum(keep)
    used_pnp = pnp.success & (n_keep >= 8)
    pose = jnp.where(used_pnp, pnp.pose, pose_init)

    # Two-view DLT for KF↔query matches without a 3D id, using the SAME
    # pose the host previously fetched and fed back (one round trip
    # saved). Tiny geometric matmuls → pin fp32 (DESIGN §7b lesson).
    with jax.default_matmul_precision("float32"):
        new_ok = (m0 >= 0) & (~kf_src_ok) & kf_mask
        m0_safe = jnp.clip(m0, 0, nq - 1)
        uv_q = q_kpts[m0_safe]
        tri_xyz, tri_err, tri_z = _tri_two_view(
            kf_kpts, uv_q, kf_P, K @ pose)
    tri_good = (new_ok
                & (jnp.max(tri_err, axis=1) < 3.0)
                & (jnp.min(tri_z, axis=1) > 0.01)
                & (jnp.max(tri_z, axis=1) < 10.0))
    return _pack_f32([pose, m0, keep, n_keep, pnp.num_inliers, used_pnp,
                      flow_ok, fpnp.num_inliers, have_init, tri_xyz,
                      tri_good])


def _unpack_track(vec: np.ndarray, nkf: int, nq: int):
    """Host-side inverse of _track_step's packing. One np.asarray fetch
    of the whole vector, then zero-copy views/casts."""
    off = 0

    def take(n):
        nonlocal off
        out = vec[off:off + n]
        off += n
        return out

    pose = take(12).reshape(3, 4)
    m0 = take(nkf).astype(np.int64)
    keep = take(nq) > 0.5
    n_keep = int(take(1)[0])
    pnp_inl = int(take(1)[0])
    used_pnp = bool(take(1)[0])
    flow_ok = bool(take(1)[0])
    flow_inl = int(take(1)[0])
    have_init = bool(take(1)[0])
    tri_xyz = take(nkf * 3).reshape(nkf, 3)
    tri_good = take(nkf) > 0.5
    assert off == len(vec)
    return (pose, m0, keep, n_keep, pnp_inl, used_pnp, flow_ok, flow_inl,
            have_init, tri_xyz, tri_good)


@functools.partial(jax.jit, static_argnames=("it1", "it2", "refine_points"))
def _window_ba_step(poses, points, cam_idx, pt_idx, uv, Kobs, mask,
                    it1, it2, refine_points):
    """Both BA stages + the pose↔camera conversions in ONE dispatch:
    camera refinement with points held fixed (DB anchors), then
    triangulated-point refinement with cameras fixed. Returns ONE packed
    f32 vector ([W*12] poses then [P*3] points): one host fetch per
    tracked frame instead of ~2·win_size small round trips (and one
    instead of two since r5 — each leaf fetch is a full tunnel RTT)."""
    cams = jax.vmap(lm.pose_to_camera)(poses)
    prob = lm.BAProblem(cams, points, cam_idx, pt_idx, uv, Kobs, mask)
    res = lm.solve_ba(prob, iterations=it1, fix_points=True,
                      fix_first_camera=True)
    if refine_points:
        res2 = lm.solve_ba(
            lm.BAProblem(res.cameras, points, cam_idx, pt_idx, uv, Kobs,
                         mask),
            iterations=it2, fix_cameras=True)
        pts_new = res2.points
    else:
        pts_new = points
    return _pack_f32([jax.vmap(lm.camera_to_pose)(res.cameras), pts_new])


@dataclass
class Frame:
    image: np.ndarray            # [H, W] grayscale: f32 in [0, 1] or uint8
                                 # (uint8 uploads 1 byte/px; converted
                                 # on device — _img_unit_f32)
    keypoints: np.ndarray        # [K, 2]
    descriptors: np.ndarray      # [K, D]
    kpt_mask: np.ndarray         # [K] valid keypoints
    pose: np.ndarray             # [3, 4] world(object)→camera
    K: np.ndarray                # [3, 3]
    point_ids: np.ndarray        # [K] global 3D point id, -1 = none
    is_keyframe: bool = False
    # device-resident mirrors (uploaded once at construction; the fused
    # per-frame kernels read these so the keyframe image/descriptors are
    # not re-uploaded on every tracked frame)
    image_dev: Optional[jax.Array] = None
    keypoints_dev: Optional[jax.Array] = None
    descriptors_dev: Optional[jax.Array] = None
    kpt_mask_dev: Optional[jax.Array] = None

    def __post_init__(self):
        if self.image_dev is None:
            self.image_dev = jnp.asarray(self.image)
            self.keypoints_dev = jnp.asarray(self.keypoints)
            self.descriptors_dev = jnp.asarray(self.descriptors)
            self.kpt_mask_dev = jnp.asarray(self.kpt_mask)


class BATracker:
    def __init__(self, win_size: int = 10, frame_interval: int = 5,
                 update_threshold_cm: float = 10.0,
                 update_threshold_deg: float = 10.0,
                 reproj_gate_scale: float = 1.2,
                 pnp_hypotheses: int = 256,
                 ba_iterations: int = 8,
                 max_obs: int = 4096,
                 seed: int = 0):
        self.win_size = win_size
        self.frame_interval = frame_interval
        self.update_threshold_cm = update_threshold_cm
        self.update_threshold_deg = update_threshold_deg
        self.reproj_gate_scale = reproj_gate_scale
        self.pnp_hypotheses = pnp_hypotheses
        self.ba_iterations = ba_iterations
        self.max_obs = max_obs
        self.key = jax.random.PRNGKey(seed)
        self.reset()

    def reset(self):
        self.frames: List[Frame] = []
        self.points3d = np.zeros((0, 3), np.float32)
        self.point_fixed = np.zeros(0, bool)  # DB points stay fixed in BA
        self.pose_history: List[np.ndarray] = []
        self.frame_id = 0

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def add_keyframe(self, image, keypoints, descriptors, kpt_mask, pose,
                     K, mkpts3d_ids=None, mkpts3d=None,
                     kpt_indices=None) -> bool:
        """Register a keyframe with (optionally) known 2D-3D matches from
        the GATsSPG stage: ``kpt_indices`` [M] keypoint slots matched to
        DB points ``mkpts3d`` [M, 3]. Pose-jump gating as in the reference
        (ba_tracker.py:128-145)."""
        pose = np.asarray(pose, np.float64)
        if self.pose_history:
            r_err, t_err = query_pose_error(pose, self.pose_history[-1])
            if (t_err > self.update_threshold_cm
                    or r_err > self.update_threshold_deg):
                return False

        point_ids = np.full(len(keypoints), -1, np.int64)
        if mkpts3d is not None and kpt_indices is not None:
            start = len(self.points3d)
            self.points3d = np.concatenate(
                [self.points3d, np.asarray(mkpts3d, np.float32)])
            self.point_fixed = np.concatenate(
                [self.point_fixed, np.ones(len(mkpts3d), bool)])
            point_ids[np.asarray(kpt_indices)] = start + np.arange(
                len(mkpts3d))

        image = np.asarray(image)
        frame = Frame(
            image=image if image.dtype == np.uint8
            else image.astype(np.float32),
            keypoints=np.asarray(keypoints, np.float32),
            descriptors=np.asarray(descriptors, np.float32),
            kpt_mask=np.asarray(kpt_mask, bool),
            pose=pose[:3, :4].astype(np.float32),
            K=np.asarray(K, np.float32),
            point_ids=point_ids, is_keyframe=True)
        self.frames.append(frame)
        self.pose_history.append(frame.pose)
        self._prune_window()
        return True

    # ------------------------------------------------------------------
    def motion_prediction(self) -> Optional[np.ndarray]:
        """Constant-velocity pose extrapolation (ba_tracker.py:275-293)."""
        if len(self.pose_history) < 2:
            return self.pose_history[-1] if self.pose_history else None
        p1 = self.pose_history[-2]
        p2 = self.pose_history[-1]
        dR = p2[:3, :3] @ p1[:3, :3].T
        dt = p2[:3, 3] - dR @ p1[:3, 3]
        R = dR @ p2[:3, :3]
        t = dR @ p2[:3, 3] + dt
        return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)

    # ------------------------------------------------------------------
    def track(self, query_image, keypoints, descriptors, kpt_mask, K):
        """Track a query frame. Returns (pose [3,4] or None, info dict)."""
        info: Dict = {"mode": None}
        if not self.frames:
            return None, info

        # upload the query tensors ONCE; the fused step and the stored
        # Frame share these device arrays. uint8 frames stay uint8 on
        # the wire (4x smaller) and normalize inside the jit.
        query_image = np.asarray(query_image)
        q_img_dev = jnp.asarray(
            query_image if query_image.dtype == np.uint8
            else query_image.astype(np.float32))
        q_kpts_dev = jnp.asarray(keypoints, jnp.float32)
        q_desc_dev = jnp.asarray(descriptors, jnp.float32)
        q_mask_dev = jnp.asarray(kpt_mask, bool)

        # Flow + motion fallback + association + gating + PnP + two-view
        # triangulation: one fused static-shape dispatch, one host sync
        # (the reference runs these as separate host stages,
        # ba_tracker.py:468-725).
        kf = self.frames[-1]
        kf_has3d = (kf.point_ids >= 0) & kf.kpt_mask
        motion = self.motion_prediction()
        has_motion = motion is not None
        if motion is None:
            motion = np.eye(3, 4, dtype=np.float32)
        nkf = kf.keypoints.shape[0]
        nq = len(keypoints)
        (pose, m0, keep, n_keep, pnp_inl, used_pnp, flow_ok, flow_inl,
         have_init, tri_xyz, tri_good) = _unpack_track(np.asarray(_track_step(
            kf.image_dev, q_img_dev, kf.keypoints_dev, kf.descriptors_dev,
            kf.kpt_mask_dev, jnp.asarray(kf_has3d),
            jnp.asarray(self.points3d[np.clip(kf.point_ids, 0, None)]),
            q_kpts_dev, q_desc_dev, q_mask_dev,
            jnp.asarray(motion), bool(has_motion),
            jnp.asarray(K, jnp.float32),
            jnp.asarray((kf.K @ kf.pose).astype(np.float32)),
            self._next_key(),
            self.pnp_hypotheses, self.reproj_gate_scale)), nkf, nq)
        if bool(flow_ok):
            info["mode"] = "flow"
            info["flow_inliers"] = int(flow_inl)
        else:
            info["mode"] = "motion"
        if not bool(have_init):
            return None, info

        matched = m0 >= 0
        point_ids = np.full(len(keypoints), -1, np.int64)
        src = np.where(matched & kf_has3d)[0]
        tgt = m0[src]
        surv = keep[tgt]
        point_ids[tgt[surv]] = kf.point_ids[src[surv]]
        pose_init = pose.astype(np.float32)
        if bool(used_pnp):
            info["pnp_inliers"] = int(pnp_inl)

        # Register the fused step's triangulated points (unassigned
        # KF↔query matches that survived the reproj/depth culling).
        new_src = np.where(matched & ~kf_has3d & kf.kpt_mask)[0]
        good_src = np.where(tri_good)[0]
        if len(new_src) >= 4 and len(good_src) > 0:
            start = len(self.points3d)
            self.points3d = np.concatenate(
                [self.points3d, tri_xyz[good_src].astype(np.float32)])
            self.point_fixed = np.concatenate(
                [self.point_fixed, np.zeros(len(good_src), bool)])
            new_ids = start + np.arange(len(good_src))
            kf.point_ids[good_src] = new_ids
            point_ids[m0[good_src]] = new_ids

        query_frame = Frame(
            image=query_image if query_image.dtype == np.uint8
            else query_image.astype(np.float32),
            keypoints=np.asarray(keypoints, np.float32),
            descriptors=np.asarray(descriptors, np.float32),
            kpt_mask=np.asarray(kpt_mask, bool),
            pose=pose_init[:3, :4].astype(np.float32),
            K=np.asarray(K, np.float32),
            point_ids=point_ids,
            image_dev=q_img_dev, keypoints_dev=q_kpts_dev,
            descriptors_dev=q_desc_dev, kpt_mask_dev=q_mask_dev)
        self.frames.append(query_frame)
        self._prune_window()

        pose = self._window_ba()
        self.pose_history.append(pose)
        info["num_tracked"] = int((point_ids >= 0).sum())
        self.frame_id += 1
        return pose, info

    def _prune_window(self):
        if len(self.frames) > self.win_size:
            self.frames = self.frames[-self.win_size:]

    # ------------------------------------------------------------------
    def _window_ba(self) -> np.ndarray:
        """Bundle-adjust the frame window (DB points fixed via a
        strong-prior trick: they are excluded from the point update by
        holding their observations in a fixed-point solve pass)."""
        C = len(self.frames)
        if C < 2:
            return self.frames[-1].pose

        # Vectorized observation assembly (no per-observation Python loop).
        cam_list, pid_raw, uv_list, K_list = [], [], [], []
        for ci, fr in enumerate(self.frames):
            idx = np.where((fr.point_ids >= 0) & fr.kpt_mask)[0]
            cam_list.append(np.full(len(idx), ci, np.int32))
            pid_raw.append(fr.point_ids[idx])
            uv_list.append(fr.keypoints[idx])
            K_list.append(np.tile(np.array(
                [fr.K[0, 0], fr.K[1, 1], fr.K[0, 2], fr.K[1, 2]],
                np.float32), (len(idx), 1)))
        obs_cam = np.concatenate(cam_list)
        pid_all = np.concatenate(pid_raw)
        obs_uv = np.concatenate(uv_list).astype(np.float32)
        obs_K = np.concatenate(K_list)
        O = len(obs_cam)
        if O < 16:
            return self.frames[-1].pose
        pid_list, obs_pt = np.unique(pid_all, return_inverse=True)
        n_pts = len(pid_list)
        if O > self.max_obs:
            keep = np.linspace(0, O - 1, self.max_obs).astype(int)
        else:
            keep = np.arange(O)

        # Pad every axis to a static bucket so the jitted LM solver does
        # not retrace as window contents change frame to frame (each
        # distinct (C, P, O) shape costs a full compile): cameras to
        # win_size (repeat the last real camera; no observation references
        # the copies, LM damping keeps their update at zero), points and
        # observations to power-of-two buckets (padded obs are masked out,
        # padded points carry no observations).
        poses = np.stack([fr.pose for fr in self.frames]).astype(np.float32)
        if C < self.win_size:
            poses = np.concatenate(
                [poses, np.repeat(poses[-1:], self.win_size - C, axis=0)])
        p_pad = max(64, 1 << (n_pts - 1).bit_length())
        points_p = np.zeros((p_pad, 3), np.float32)
        points_p[:n_pts] = self.points3d[pid_list]
        n_obs = len(keep)
        o_pad = max(256, 1 << (n_obs - 1).bit_length())
        obs_cam_p = np.zeros(o_pad, np.int32)
        obs_pt_p = np.zeros(o_pad, np.int32)
        obs_uv_p = np.zeros((o_pad, 2), np.float32)
        obs_K_p = np.tile(obs_K[0], (o_pad, 1))
        obs_mask = np.zeros(o_pad, bool)
        obs_cam_p[:n_obs] = obs_cam[keep]
        obs_pt_p[:n_obs] = obs_pt[keep].astype(np.int32)
        obs_uv_p[:n_obs] = obs_uv[keep]
        obs_K_p[:n_obs] = obs_K[keep]
        obs_mask[:n_obs] = True

        # Both solve stages + pose conversions in one dispatch, one fetch.
        free = ~self.point_fixed[pid_list]
        packed = np.asarray(_window_ba_step(
            jnp.asarray(poses), jnp.asarray(points_p),
            jnp.asarray(obs_cam_p), jnp.asarray(obs_pt_p),
            jnp.asarray(obs_uv_p), jnp.asarray(obs_K_p),
            jnp.asarray(obs_mask),
            self.ba_iterations, max(self.ba_iterations // 2, 2),
            bool(free.any())))
        W = poses.shape[0]
        poses_new = packed[:W * 12].reshape(W, 3, 4)
        pts_new = packed[W * 12:].reshape(p_pad, 3)
        if free.any():
            self.points3d[pid_list[free]] = pts_new[:n_pts][free]
        for ci, fr in enumerate(self.frames):
            fr.pose = poses_new[ci]
        return self.frames[-1].pose
