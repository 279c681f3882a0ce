"""Global bundle adjustment over a triangulated model.

Replaces the reference's ``colmap bundle_adjuster`` subprocess
(/root/reference/src/sfm/global_ba.py:9-32 — 150 iterations, extrinsics-only
refinement, intrinsics fixed) with the on-device Schur-LM solver.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from onepose_tpu.ops import lm
from onepose_tpu.utils import colmap_io
from onepose_tpu.utils.geometry import qvec2rotmat, rotmat2qvec


def run_bundle_adjuster(model_dir: str, output_dir: Optional[str] = None,
                        iterations: int = 20,
                        refine_extrinsics: bool = True,
                        refine_points: bool = True,
                        max_obs: int = 65536) -> dict:
    """Load a COLMAP-format model, bundle-adjust, write it back."""
    cameras, images, points3D = colmap_io.read_model(model_dir)
    if not points3D:
        return {"final_cost": 0.0, "initial_cost": 0.0}

    image_ids = sorted(images.keys())
    cam_slot = {iid: i for i, iid in enumerate(image_ids)}
    point_ids = sorted(points3D.keys())
    pt_slot = {pid: i for i, pid in enumerate(point_ids)}

    cams = []
    Kparams = {}
    for iid in image_ids:
        im = images[iid]
        R = qvec2rotmat(im.qvec)
        pose = np.concatenate([R, np.asarray(im.tvec)[:, None]], axis=1)
        cams.append(np.asarray(lm.pose_to_camera(pose)))
        cam = cameras[im.camera_id]
        if cam.model == "PINHOLE":
            fx, fy, cx, cy = cam.params
        elif cam.model == "SIMPLE_PINHOLE":
            fx = fy = cam.params[0]
            cx, cy = cam.params[1:3]
        else:
            raise NotImplementedError(cam.model)
        Kparams[iid] = [fx, fy, cx, cy]

    obs_cam, obs_pt, obs_uv, obs_K = [], [], [], []
    for pid in point_ids:
        pt = points3D[pid]
        for iid, ki in zip(pt.image_ids, pt.point2D_idxs):
            obs_cam.append(cam_slot[int(iid)])
            obs_pt.append(pt_slot[pid])
            obs_uv.append(images[int(iid)].xys[int(ki)])
            obs_K.append(Kparams[int(iid)])
    O = len(obs_cam)
    keep = (np.linspace(0, O - 1, max_obs).astype(int)
            if O > max_obs else np.arange(O))

    problem = lm.BAProblem(
        cameras=jnp.asarray(np.stack(cams), jnp.float32),
        points=jnp.asarray(
            np.stack([points3D[p].xyz for p in point_ids]), jnp.float32),
        cam_idx=jnp.asarray(np.asarray(obs_cam)[keep], jnp.int32),
        pt_idx=jnp.asarray(np.asarray(obs_pt)[keep], jnp.int32),
        uv=jnp.asarray(np.asarray(obs_uv)[keep], jnp.float32),
        K=jnp.asarray(np.asarray(obs_K)[keep], jnp.float32),
        mask=jnp.ones(len(keep), bool))

    res = lm.solve_ba(
        problem, iterations=iterations,
        fix_cameras=not refine_extrinsics,
        fix_points=not refine_points)

    cams_new = np.asarray(res.cameras)
    pts_new = np.asarray(res.points)
    for i, iid in enumerate(image_ids):
        pose = np.asarray(lm.camera_to_pose(jnp.asarray(cams_new[i])))
        images[iid].qvec = rotmat2qvec(pose[:3, :3])
        images[iid].tvec = pose[:3, 3].astype(np.float64)
    for pid in point_ids:
        points3D[pid].xyz = pts_new[pt_slot[pid]].astype(np.float64)

    colmap_io.write_model(cameras, images, points3D,
                          output_dir or model_dir)
    return {"initial_cost": float(res.initial_cost),
            "final_cost": float(res.final_cost)}
