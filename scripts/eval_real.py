#!/usr/bin/env python
"""Real-assets eval harness: the acceptance gate, kept warm.

The behavioral-parity test suite stands in while no reference checkpoints
or OnePose data exist in this environment (zero egress). The moment
``superpoint_v1.pth`` / ``GATsSPG.ckpt`` and the dataset land under
``data/``, this single entry runs the full protocol and records the
cmd1/3/5 numbers (reference protocol:
/root/reference/configs/experiment/test_GATsSPG.yaml,
/root/reference/inference.py:179-182):

  1. asset check — weights, data lists, sequence dirs, per-object SfM anno
  2. SfM mapping for any object whose anno artifacts are missing (run.py)
  3. ``inference.py +experiment=test_sample`` then ``test_GATsSPG``
  4. append the aggregate metrics to BASELINE.md (timestamped)

Usage:
  python scripts/eval_real.py --check                 # asset report only
  python scripts/eval_real.py                         # full protocol
  python scripts/eval_real.py --experiments test_sample
  python scripts/eval_real.py -o data_dir=/elsewhere  # dotted overrides
"""
from __future__ import annotations

import argparse
import datetime
import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

# experiment -> the preprocess config that builds its SfM annos
SFM_PREPROCESS = {
    "test_sample": "sfm_spp_spg_sample",
    "test_GATsSPG": "sfm_spp_spg_test",
}


def _read_list(path):
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def check_assets(cfg):
    """Returns (ok, present, missing): asset availability for one
    experiment config."""
    present, missing = [], []

    def probe(path, label):
        (present if osp.exists(path) else missing).append(f"{label}: {path}")

    probe(cfg.model.onepose_model_path, "GATsSPG checkpoint")
    probe(cfg.model.extractor_model_path, "SuperPoint weights")
    probe(cfg.input.data_list, "data list")
    probe(cfg.input.sfm_list, "sfm list")
    if osp.exists(cfg.input.data_list):
        for entry in _read_list(cfg.input.data_list):
            parts = entry.split(" ")
            obj_dir, seqs = parts[0], parts[1:]
            for seq in seqs:
                probe(osp.join(cfg.scan_data_dir, obj_dir, seq),
                      f"sequence {obj_dir}/{seq}")
    return not missing, present, missing


def missing_sfm_objects(cfg):
    """Objects in the sfm list whose anno artifacts don't exist yet."""
    from onepose_tpu.utils import path_utils

    if not osp.exists(cfg.input.sfm_list):
        return []
    todo = []
    for sfm_name in _read_list(cfg.input.sfm_list):
        anno_dir = path_utils.get_anno_dir(
            osp.join(cfg.sfm_model_dir, sfm_name),
            cfg.network.detection, cfg.network.matching)
        if not osp.exists(osp.join(anno_dir, "anno_3d_average.npz")):
            todo.append(sfm_name)
    return todo


def run_experiment(experiment, overrides, baseline_out, skip_sfm=False):
    import inference as inference_cli
    import run as run_cli
    from onepose_tpu.config import load_config

    cfg = load_config([f"+experiment={experiment}"] + list(overrides))
    ok, present, missing = check_assets(cfg)
    if missing:
        print(f"[eval_real] {experiment}: BLOCKED — missing assets:")
        for m in missing:
            print(f"  - {m}")
        return None

    todo = missing_sfm_objects(cfg)
    if todo and not skip_sfm:
        pre = SFM_PREPROCESS.get(experiment)
        if pre is None:
            print(f"[eval_real] {experiment}: no preprocess mapping; "
                  f"{len(todo)} objects lack SfM annos: {todo}")
            return None
        print(f"[eval_real] building SfM annos for {len(todo)} objects "
              f"via +preprocess={pre}")
        sfm_cfg = load_config([f"+preprocess={pre}"] + list(overrides))
        run_cli.sfm(sfm_cfg)

    print(f"[eval_real] running inference +experiment={experiment}")
    results = inference_cli.inference(cfg)
    if not results:
        print(f"[eval_real] {experiment}: no sequences evaluated")
        return None

    import numpy as np

    agg = {k: float(np.mean([r[k] for r in results.values()]))
           for k in next(iter(results.values()))}
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## Measured on real assets — `{experiment}` ({stamp})",
        "",
        f"Sequences: {len(results)}.",
        "",
        "| metric | value |",
        "|---|---|",
    ]
    for k in sorted(agg):
        lines.append(f"| {k} | {agg[k]:.4f} |")
    with open(baseline_out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[eval_real] {experiment}: {agg} → appended to {baseline_out}")
    return agg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--experiments", nargs="+",
                    default=["test_sample", "test_GATsSPG"])
    ap.add_argument("--check", action="store_true",
                    help="asset report only, no runs")
    ap.add_argument("-o", "--overrides", nargs="*", default=[],
                    help="dotted config overrides, e.g. data_dir=/x")
    ap.add_argument("--baseline-out", default=osp.join(REPO, "BASELINE.md"))
    ap.add_argument("--skip-sfm", action="store_true",
                    help="fail instead of building missing SfM annos")
    args = ap.parse_args(argv)

    os.chdir(REPO)
    if args.check:
        from onepose_tpu.config import load_config

        all_ok = True
        for exp in args.experiments:
            cfg = load_config([f"+experiment={exp}"] + args.overrides)
            ok, present, missing = check_assets(cfg)
            state = "READY" if ok else "BLOCKED"
            print(f"[eval_real] {exp}: {state} "
                  f"({len(present)} present, {len(missing)} missing)")
            for m in missing:
                print(f"  - missing {m}")
            all_ok &= ok
        return 0 if all_ok else 1

    any_ran = False
    for exp in args.experiments:
        if run_experiment(exp, args.overrides, args.baseline_out,
                          skip_sfm=args.skip_sfm) is not None:
            any_ran = True
    return 0 if any_ran else 1


if __name__ == "__main__":
    raise SystemExit(main())
