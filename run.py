#!/usr/bin/env python
"""SfM / preprocessing driver.

Public-surface equivalent of the reference's ``run.py``
(/root/reference/run.py): dispatches on ``cfg.type``:

    python run.py +preprocess=sfm_spp_spg_sample
    python run.py +preprocess=merge_anno split=train

The compute path is TPU-native (batched SuperPoint/SuperGlue, on-device
triangulation) — see onepose_tpu/sfm/.
"""
import os.path as osp
import sys


def _read_list(path):
    with open(path, "r") as f:
        return [line.strip() for line in f if line.strip()]


def sfm(cfg):
    from onepose_tpu.sfm import runner
    from onepose_tpu.utils import model_io

    sp_params = model_io.load_superpoint_params(
        cfg.network.detection_model_path)
    sg_params = model_io.load_superglue_params(
        cfg.network.matching_model_path)

    entries = _read_list(cfg.dataset.data_list)
    for entry in entries:
        parts = entry.split(" ")
        obj_dir, seqs = parts[0], parts[1:]
        root_dir = osp.join(cfg.scan_data_dir, obj_dir)
        data_dirs = [osp.join(root_dir, s) for s in seqs]
        print(f"[sfm] processing {root_dir}")

        img_lists = runner.gather_img_lists(
            data_dirs, down_ratio=cfg.sfm.down_ratio)
        if not img_lists:
            print(f"[sfm] no images in {root_dir}")
            continue
        Ks, poses, sizes = runner.load_sequence_calib(img_lists)

        obj_name = obj_dir.split("/")[-1]
        outputs_root = cfg.dataset.outputs_dir.format(obj_name)
        outputs_dir = osp.join(
            outputs_root,
            f"outputs_{cfg.network.detection}_{cfg.network.matching}")
        box_path = osp.join(root_dir, "box3d_corners.txt")
        mesh = None
        n_dev = int(cfg.get("n_devices", 1) or 1)
        if n_dev > 1:
            from onepose_tpu.parallel import mesh as pmesh

            mesh = pmesh.make_mesh(n_dev, (n_dev, 1))
        stats = runner.run_sfm(
            img_lists, outputs_dir, sp_params, sg_params, Ks, poses,
            sizes, box_path=box_path if osp.exists(box_path) else None,
            covis_num=cfg.sfm.covis_num,
            max_num_points=cfg.dataset.max_num_kp3d, redo=cfg.redo,
            mesh=mesh)
        print(f"[sfm] {obj_name}: {stats}")


def merge_anno(cfg):
    from onepose_tpu.datasets.merge import merge_anno as merge

    names_file = (cfg.train.names_file if cfg.split == "train"
                  else cfg.val.names_file)
    names = _read_list(names_file)
    merge(cfg.datamodule.data_dir, names, cfg.datamodule.out_path,
          detection=cfg.network.detection, matching=cfg.network.matching)


def main():
    from onepose_tpu.config import load_config
    from onepose_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()  # restart economics: DESIGN §11

    cfg = load_config(sys.argv[1:])
    {"sfm": sfm, "merge_anno": merge_anno}[cfg.type](cfg)


if __name__ == "__main__":
    main()
