"""run.py CLI surface: the sfm() dispatch over a real on-disk dataset
(data_list parsing, calibration loading, outputs_dir formatting, artifact
placement), and merge_anno() over the produced annotations."""
import json
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import run as run_cli  # noqa: E402
from onepose_tpu.config import Config  # noqa: E402
from onepose_tpu.utils import geometry as geo  # noqa: E402

cv2 = pytest.importorskip("cv2")


def build_capture(tmp_path, rng, n_frames=6, hw=64):
    """Object capture on disk: textured frames + calibration."""
    obj = tmp_path / "scan" / "0001-toy-box"
    seq = obj / "toy-1"
    for d in ("color", "intrin_ba", "poses_ba"):
        (seq / d).mkdir(parents=True)
    K = np.array([[80.0, 0, hw / 2], [0, 80.0, hw / 2], [0, 0, 1]])
    np.savetxt(str(obj / "box3d_corners.txt"), np.array([
        [-1, -1, -1], [-1, 1, -1], [1, 1, -1], [1, -1, -1],
        [-1, -1, 1], [-1, 1, 1], [1, 1, 1], [1, -1, 1]]) * 0.2)
    tex = cv2.resize(rng.uniform(0, 255, (16, 16)).astype(np.uint8),
                     (hw, hw), interpolation=cv2.INTER_CUBIC)
    for i in range(n_frames):
        # down_ratio=2 with even indices kept → name with stride 1 but we
        # name frames 0..n so downsampling still leaves >= 3
        cv2.imwrite(str(seq / "color" / f"{i}.png"),
                    np.roll(tex, i * 3, axis=1))
        np.savetxt(str(seq / "intrin_ba" / f"{i}.txt"), K)
        pose = np.eye(4)
        pose[:3, :3] = geo.rodrigues([0.3 + 0.1 * i, 0.05 * i, 0.0])
        pose[:3, 3] = [0.01 * i, 0.0, 0.5]
        np.savetxt(str(seq / "poses_ba" / f"{i}.txt"), pose)
    return obj


@pytest.mark.slow
def test_run_sfm_dispatch(tmp_path):
    rng = np.random.default_rng(0)
    build_capture(tmp_path, rng)

    import jax

    from onepose_tpu.models import superglue, superpoint
    from onepose_tpu.utils import model_io

    # stand-in "checkpoints": native orbax param dirs
    sp_dir = str(tmp_path / "weights" / "sp")
    sg_dir = str(tmp_path / "weights" / "sg")
    model_io.save_pytree(
        superpoint.init_params(jax.random.PRNGKey(0)), sp_dir)
    model_io.save_pytree(
        superglue.init_params(jax.random.PRNGKey(1)), sg_dir)

    data_list = str(tmp_path / "list.txt")
    with open(data_list, "w") as f:
        f.write("0001-toy-box toy-1\n")

    cfg = Config({
        "type": "sfm",
        "redo": False,
        "scan_data_dir": str(tmp_path / "scan"),
        "dataset": Config({
            "max_num_kp3d": 100,
            "data_list": data_list,
            "outputs_dir": str(tmp_path / "sfm_model") + "/{}",
        }),
        "network": Config({
            "detection": "superpoint", "matching": "superglue",
            "detection_model_path": sp_dir,
            "matching_model_path": sg_dir,
        }),
        "sfm": Config({"down_ratio": 2, "covis_num": 4,
                       "rotation_thresh": 50}),
    })
    run_cli.sfm(cfg)

    out = tmp_path / "sfm_model" / "0001-toy-box" / \
        "outputs_superpoint_superglue"
    assert (out / "feats-superpoint.h5").exists()
    assert (out / "pairs-covis4.txt").exists()
    assert (out / "matches-superglue.h5").exists()
    assert (out / "sfm_ws" / "database.db").exists()
    assert (out / "sfm_ws" / "model" / "points3D.bin").exists()
    assert (out / "anno" / "anno_3d_average.npz").exists()
    # down_ratio=2 → only even-indexed frames extracted
    import h5py

    with h5py.File(str(out / "feats-superpoint.h5")) as f:
        names = list(f.keys())
    # h5 group paths nest by '/'; count leaf image groups
    def count_leaves(g, n=0):
        for k in g:
            if hasattr(g[k], "keys") and "keypoints" not in g[k]:
                n = count_leaves(g[k], n)
            else:
                n += 1
        return n
    with h5py.File(str(out / "feats-superpoint.h5")) as f:
        n_imgs = count_leaves(f)
    assert n_imgs == 3  # frames 0, 2, 4

    # resumability: second call reuses artifacts without error
    run_cli.sfm(cfg)
