"""ARKit capture ingest: synthesize a OnePose-Cap-style capture (video +
Frames.txt + ARposes.txt + Box.txt) and verify parse_scanned_data produces
the dataset layout with geometrically consistent artifacts."""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import parse_scanned_data as psd  # noqa: E402
from onepose_tpu.utils import geometry as geo  # noqa: E402

cv2 = pytest.importorskip("cv2")


def synth_capture(seq_dir, rng, n_frames=6, hw=(480, 640)):
    """Camera orbiting an object box at the world origin."""
    seq_dir.mkdir(parents=True)
    h, w = hw
    fx = fy = 500.0
    cx, cy = w / 2, h / 2

    with open(seq_dir / "Frames.txt", "w") as f:
        for i in range(n_frames):
            f.write(f"{i * 0.03},{i},{fx},{fy},{cx},{cy}\n")

    # object box: centered at origin, extents 0.2x0.3x0.15, identity rot
    with open(seq_dir / "Box.txt", "w") as f:
        f.write("# px,py,pz,ex,ey,ez,qw,qx,qy,qz\n")
        f.write("0,0,0,0.2,0.3,0.15,1,0,0,0\n")

    # camera poses: ARKit convention — ARposes gives T_cw (camera in world)
    # with the gravity flip folded into the parser. To synthesize, invert
    # the parser's math: choose the object pose T_oc we want, derive the
    # ARposes entry.
    poses_oc = []
    lines = ["# ts,px,py,pz,qw,qx,qy,qz"]
    for i in range(n_frames):
        R_oc = geo.rodrigues([0.2 + 0.05 * i, 0.1 * i, 0.02])
        t_oc = np.array([0.02 * i - 0.05, 0.01, 0.8])
        T_oc = np.eye(4)
        T_oc[:3, :3] = R_oc
        T_oc[:3, 3] = t_oc
        poses_oc.append(T_oc)
        # T_oc = inv(T_cw) @ T_ow, T_ow = I → T_cw = inv(T_oc)
        T_cw = np.linalg.inv(T_oc)
        # parser builds rot = quat2mat(q) @ diag(1,-1,-1)
        R_q = T_cw[:3, :3] @ np.diag([1.0, -1.0, -1.0])
        q = geo.rotmat2qvec(R_q)
        p = T_cw[:3, 3]
        lines.append(
            f"{i * 0.03},{p[0]},{p[1]},{p[2]},{q[0]},{q[1]},{q[2]},{q[3]}")
    with open(seq_dir / "ARposes.txt", "w") as f:
        f.write("\n".join(lines))

    # video: textured frames
    writer = cv2.VideoWriter(
        str(seq_dir / "Frames.m4v"), cv2.VideoWriter_fourcc(*"mp4v"),
        30, (w, h))
    tex = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    for i in range(n_frames):
        writer.write(np.roll(tex, i * 5, axis=1))
    writer.release()
    return poses_oc


def test_data_process_anno(tmp_path):
    rng = np.random.default_rng(0)
    obj_root = tmp_path / "0999-testobj-box"
    seq = obj_root / "testobj-annotate"
    poses_oc = synth_capture(seq, rng)

    psd.data_process_anno(str(seq))

    # box corners written at the object root
    corners = np.loadtxt(str(obj_root / "box3d_corners.txt"))
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(
        corners.max(0) - corners.min(0), [0.2, 0.3, 0.15], atol=1e-9)

    # intrinsics averaged
    K, _ = geo.get_K(str(seq / "intrinsics.txt"))
    np.testing.assert_allclose(K[0, 0], 500.0)

    # per-frame poses match the synthesized T_oc
    for i, T_oc in enumerate(poses_oc):
        pose_path = seq / "poses" / f"{i}.txt"
        assert pose_path.exists(), f"missing pose {i}"
        got = np.loadtxt(str(pose_path))
        np.testing.assert_allclose(got, T_oc, atol=1e-6)

    # crops + intrinsics + M transforms exist and are consistent
    for i in range(len(poses_oc)):
        crop_path = seq / "color" / f"{i}.png"
        assert crop_path.exists()
        crop = cv2.imread(str(crop_path))
        assert crop.shape[:2] == (512, 512)
        K_crop = np.loadtxt(str(seq / "intrin" / f"{i}.txt"))
        M = np.loadtxt(str(seq / "M" / f"{i}.txt"))  # crop→full
        # box reprojected with K_crop must lie mostly inside the crop
        bbox_crop = np.loadtxt(str(seq / "bbox" / f"{i}.txt"))
        assert bbox_crop[0] > -200 and bbox_crop[2] < 712
        # M maps crop center near the full-image projection of the object
        uv_full_center = M @ np.array([256.0, 256.0, 1.0])
        corners2d = geo.project_points(corners, K, poses_oc[i])
        c_min, c_max = corners2d.min(0), corners2d.max(0)
        assert (uv_full_center[0] > c_min[0] - 50
                and uv_full_center[0] < c_max[0] + 50)

    # *_ba symlinks
    assert osp.islink(str(seq / "intrin_ba"))
    assert osp.islink(str(seq / "poses_ba"))
    assert (seq / "color_full" / "0.png").exists()


def test_data_process_test(tmp_path):
    rng = np.random.default_rng(1)
    seq = tmp_path / "0999-testobj-box" / "testobj-test"
    synth_capture(seq, rng, n_frames=4)
    psd.data_process_test(str(seq))
    assert (seq / "intrinsics.txt").exists()
    frames = list((seq / "color_full").glob("*.png"))
    assert len(frames) == 4
