"""Smoke test for the real-assets eval harness (scripts/eval_real.py):
against synthetic fixtures it must run the full check → inference →
BASELINE-append path; with assets missing it must report BLOCKED."""
import os
import os.path as osp
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "scripts"))
from test_cli_integration import build_dataset  # noqa: E402

import eval_real  # noqa: E402


def test_eval_real_smoke(tmp_path):
    rng = np.random.default_rng(0)
    build_dataset(tmp_path, rng)

    import jax

    from onepose_tpu.models import gats_spg, superpoint
    from onepose_tpu.utils import model_io

    root = str(tmp_path)
    model_io.save_pytree(
        superpoint.init_params(jax.random.PRNGKey(0)),
        osp.join(root, "sp_ckpt"))
    model_io.save_pytree(
        gats_spg.init_params(jax.random.PRNGKey(1)),
        osp.join(root, "gats_ckpt"))
    with open(osp.join(root, "eval_list.txt"), "w") as f:
        f.write("0001-obj-box obj-1\n")
    with open(osp.join(root, "eval_sfm.txt"), "w") as f:
        f.write("0001-obj-box\n")

    baseline = osp.join(root, "BASELINE_smoke.md")
    overrides = [
        f"model.onepose_model_path={root}/gats_ckpt",
        f"model.extractor_model_path={root}/sp_ckpt",
        f"scan_data_dir={root}/data/onepose_datasets/test_data",
        f"sfm_model_dir={root}/data/sfm_model",
        f"input.data_list={root}/eval_list.txt",
        f"input.sfm_list={root}/eval_sfm.txt",
        "num_leaf=4", "shape3d=32", "max_keypoints=64", "batch_size=2",
        "pnp.num_hypotheses=32", "pnp.refine_iters=2",
        f"output.eval_dir={root}/runs/eval",
    ]
    cwd = os.getcwd()
    try:
        rc = eval_real.main(
            ["--experiments", "test_sample", "--skip-sfm",
             "--baseline-out", baseline, "-o"] + overrides)
    finally:
        os.chdir(cwd)
    assert rc == 0
    text = open(baseline).read()
    assert "test_sample" in text and "cmd1" in text and "cmd5" in text
    # the per-sequence eval report also lands
    assert osp.exists(osp.join(root, "runs/eval",
                               "0001-obj-boxobj-1.txt"))


def test_eval_real_check_reports_blocked(tmp_path):
    cwd = os.getcwd()
    try:
        rc = eval_real.main(
            ["--check", "--experiments", "test_sample", "-o",
             f"data_dir={tmp_path}/nonexistent"])
    finally:
        os.chdir(cwd)
    assert rc == 1
