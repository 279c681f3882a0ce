"""Model parameter IO.

Two sources:
- reference PyTorch checkpoints (``superpoint_v1.pth``, ``GATsSPG.ckpt``,
  ``superglue_outdoor.pth``) converted on load via
  :mod:`onepose_tpu.models.convert` (mirrors the reference's prefix-stripping
  loader, /root/reference/src/utils/model_io.py:58-126);
- native orbax checkpoints of param/opt-state pytrees for training.
"""
from __future__ import annotations

import os.path as osp
from typing import Optional


def _is_torch_ckpt(path: str) -> bool:
    return path.endswith((".pth", ".ckpt", ".pt"))


def load_superpoint_params(path: str):
    from onepose_tpu.models import convert

    if _is_torch_ckpt(path):
        return convert.superpoint_from_state_dict(
            convert.load_state_dict(path, strip_prefixes=("extractor.",)))
    return load_pytree(path)


def load_gats_params(path: str):
    from onepose_tpu.models import convert

    if _is_torch_ckpt(path):
        return convert.gats_spg_from_state_dict(
            convert.load_state_dict(path, strip_prefixes=("matcher.",)))
    return load_pytree(path)


def load_superglue_params(path: str):
    from onepose_tpu.models import convert

    if _is_torch_ckpt(path):
        return convert.superglue_from_state_dict(
            convert.load_state_dict(path))
    return load_pytree(path)


# ---------------------------------------------------------------------------
# Native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_pytree(tree, path: str):
    """Save a parameter pytree with orbax (directory checkpoint),
    overwriting an existing checkpoint at the same path (the 'last'
    checkpoint is rewritten every epoch)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(osp.abspath(path), target)
    return ckptr.restore(osp.abspath(path))


def save_train_state(state, path: str):
    """Save TrainState (params + opt_state + step)."""
    save_pytree(
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step}, path)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Find the highest-epoch checkpoint dir named ``epoch=<n>`` (mirrors the
    reference's epoch-numbered .pth discovery, model_io.py:66-81)."""
    import glob
    import re

    cands = glob.glob(osp.join(ckpt_dir, "epoch=*"))
    best, best_epoch = None, -1
    for c in cands:
        m = re.search(r"epoch=(\d+)", osp.basename(c))
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = c, int(m.group(1))
    return best
