"""Integration for the remaining entry points: the feature-matching
detector CLI (color_det/intrin_det production) and the demo video pipeline
(detect → crop → pose → box render → mp4), over a real on-disk capture with
random weights — exercises the full code paths and artifact contracts, not
metric quality."""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from onepose_tpu.config import Config  # noqa: E402

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def demo_world(tmp_path_factory):
    """Capture + SfM workspace + weights, shared by both CLI tests."""
    import jax

    import run as run_cli
    from test_run_cli import build_capture
    from onepose_tpu.models import gats_spg, superglue, superpoint
    from onepose_tpu.utils import model_io

    # shrink the architectures for CPU test speed (the CLIs read the
    # module DEFAULT_CONFIGs; restored in the fixture finalizer)
    saved = (dict(superglue.DEFAULT_CONFIG), dict(gats_spg.DEFAULT_CONFIG))
    superglue.DEFAULT_CONFIG.update(
        {"num_gnn_layers": 2, "sinkhorn_iterations": 10})
    gats_spg.DEFAULT_CONFIG.update({"num_blocks": 1})

    tmp_path = tmp_path_factory.mktemp("demo_world")
    rng = np.random.default_rng(0)
    obj = build_capture(tmp_path, rng, n_frames=6, hw=64)
    seq = obj / "toy-1"

    # full frames + global intrinsics (the demo/detector inputs)
    (seq / "color_full").mkdir()
    for i in range(6):
        img = cv2.imread(str(seq / "color" / f"{i}.png"))
        cv2.imwrite(str(seq / "color_full" / f"{i}.png"), img)
    with open(str(seq / "intrinsics.txt"), "w") as f:
        f.write("fx: 80.0\nfy: 80.0\ncx: 32.0\ncy: 32.0\n")

    weights = {}
    for name, params in (
            ("sp", superpoint.init_params(jax.random.PRNGKey(0))),
            ("sg", superglue.init_params(jax.random.PRNGKey(1))),
            ("gats", gats_spg.init_params(jax.random.PRNGKey(2)))):
        d = str(tmp_path / "weights" / name)
        model_io.save_pytree(params, d)
        weights[name] = d

    data_list = str(tmp_path / "list.txt")
    with open(data_list, "w") as f:
        f.write("0001-toy-box toy-1\n")
    cfg = Config({
        "type": "sfm", "redo": False,
        "scan_data_dir": str(tmp_path / "scan"),
        "dataset": Config({
            "max_num_kp3d": 100, "data_list": data_list,
            "outputs_dir": str(tmp_path / "sfm_model") + "/{}"}),
        "network": Config({
            "detection": "superpoint", "matching": "superglue",
            "detection_model_path": weights["sp"],
            "matching_model_path": weights["sg"]}),
        "sfm": Config({"down_ratio": 1, "covis_num": 4,
                       "rotation_thresh": 50}),
    })
    run_cli.sfm(cfg)
    yield {"tmp": tmp_path, "obj": obj, "seq": seq, "weights": weights}
    superglue.DEFAULT_CONFIG.clear()
    superglue.DEFAULT_CONFIG.update(saved[0])
    gats_spg.DEFAULT_CONFIG.clear()
    gats_spg.DEFAULT_CONFIG.update(saved[1])


@pytest.mark.slow
def test_feature_matching_detector_cli(demo_world):
    import feature_matching_object_detector as fmod

    tmp = demo_world["tmp"]
    seq = demo_world["seq"]
    w = demo_world["weights"]

    cfg = Config({
        "network": Config({"detection": "superpoint",
                           "matching": "superglue"}),
        "n_ref_view": 3,
        "max_keypoints": 64,
        "model": Config({"extractor_model_path": w["sp"],
                         "matching_model_path": w["sg"]}),
    })
    from onepose_tpu.utils import model_io

    sp_params = model_io.load_superpoint_params(w["sp"])
    sg_params = model_io.load_superglue_params(w["sg"])
    sfm_model_dir = str(tmp / "sfm_model" / "0001-toy-box")
    fmod.detect_sequence(cfg, str(seq), sfm_model_dir, sp_params,
                         sg_params)

    crops = sorted((seq / "color_det").glob("*.png"))
    intrs = sorted((seq / "intrin_det").glob("*.txt"))
    assert len(crops) == 6 and len(intrs) == 6
    crop = cv2.imread(str(crops[0]), cv2.IMREAD_GRAYSCALE)
    assert crop.shape == (512, 512)
    K_crop = np.loadtxt(str(intrs[0]))
    assert K_crop.shape == (3, 3) and np.isfinite(K_crop).all()


@pytest.mark.slow
def test_inference_demo_cli(demo_world):
    import inference_demo as demo_cli

    tmp = demo_world["tmp"]
    obj = demo_world["obj"]
    w = demo_world["weights"]

    cfg = Config({
        "type": "inference_demo",
        "num_leaf": 2, "n_ref_view": 3, "max_keypoints": 64,
        "shape3d": 64, "use_tracking": False,
        "data_root": str(obj),
        "data_seq": "toy-1",
        "model": Config({
            "onepose_model_path": w["gats"],
            "extractor_model_path": w["sp"],
            "matching_model_path": w["sg"]}),
        "network": Config({"detection": "superpoint",
                           "matching": "superglue"}),
        "sfm_model_dir": str(tmp / "sfm_model"),
        "pnp": Config({"reproj_threshold": 5.0, "num_hypotheses": 32,
                       "refine_iters": 2}),
        "output": Config({"demo_dir": str(tmp / "demo_out")}),
    })
    demo_cli.inference_core(cfg)
    assert osp.exists(str(tmp / "demo_out" / "demo_video.mp4"))
    frames = list((tmp / "demo_out" / "frames").glob("*.png"))
    assert len(frames) == 6
    import json

    with open(str(tmp / "demo_out" / "poses.json")) as f:
        log = json.load(f)
    assert len(log) == 6 and all(e["source"] == "pnp" for e in log)


@pytest.mark.slow
def test_inference_demo_cli_tracking(demo_world):
    """--use_tracking engages the BA tracker: the per-frame pose log must
    record tracker-sourced poses once a keyframe is live."""
    import inference_demo as demo_cli

    tmp = demo_world["tmp"]
    obj = demo_world["obj"]
    w = demo_world["weights"]

    cfg = Config({
        "type": "inference_demo",
        "num_leaf": 2, "n_ref_view": 3, "max_keypoints": 64,
        "shape3d": 64, "use_tracking": True,
        "data_root": str(obj),
        "data_seq": "toy-1",
        "model": Config({
            "onepose_model_path": w["gats"],
            "extractor_model_path": w["sp"],
            "matching_model_path": w["sg"]}),
        "network": Config({"detection": "superpoint",
                           "matching": "superglue"}),
        "sfm_model_dir": str(tmp / "sfm_model"),
        "pnp": Config({"reproj_threshold": 5.0, "num_hypotheses": 32,
                       "refine_iters": 2}),
        "output": Config({"demo_dir": str(tmp / "demo_track_out")}),
    })
    demo_cli.inference_core(cfg)
    import json

    with open(str(tmp / "demo_track_out" / "poses.json")) as f:
        log = json.load(f)
    assert len(log) == 6
    # with random weights PnP/gating may legitimately fail per frame; the
    # CLI contract is structural: every entry records its provenance (the
    # tracked-pose accuracy assertion is
    # test_tracker.py::test_demo_apply_tracking_drives_poses).
    for e in log:
        assert e["source"] == "pnp" or e["source"].startswith("track:")
        assert e["pose"] is None or np.isfinite(e["pose"]).all()
