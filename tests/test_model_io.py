"""Checkpoint-file ingestion: loading real .pth / Lightning .ckpt files
through model_io (torch.save → load_state_dict → conversion), matching
direct state-dict conversion; orbax roundtrips; epoch discovery."""
import os.path as osp

import numpy as np
import pytest

import conftest

from onepose_tpu.utils import model_io

torch = pytest.importorskip("torch")


def test_load_superpoint_pth(tmp_path):
    if not conftest.reference_available():
        pytest.skip("reference not present")
    from ref_loader import load_ref_superpoint
    from onepose_tpu.models.convert import superpoint_from_state_dict

    torch.manual_seed(0)
    ref = load_ref_superpoint()({"max_keypoints": 64}).eval()
    path = str(tmp_path / "superpoint_v1.pth")
    torch.save(ref.state_dict(), path)

    params = model_io.load_superpoint_params(path)
    direct = superpoint_from_state_dict(ref.state_dict())
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_gats_lightning_ckpt(tmp_path):
    """Lightning-style checkpoint: {'state_dict': {'matcher.<k>': v, ...}}
    with extractor.* entries to be ignored."""
    if not conftest.reference_available():
        pytest.skip("reference not present")
    from ref_loader import load_ref_gats_spg
    from onepose_tpu.models.convert import gats_spg_from_state_dict
    from test_gats_spg_parity import HPARAMS

    torch.manual_seed(0)
    ref = load_ref_gats_spg()(HPARAMS).eval()
    sd = {f"matcher.{k}": v for k, v in ref.state_dict().items()}
    # Lightning ckpts carry the frozen extractor too; must be skipped
    sd["extractor.conv1a.weight"] = torch.zeros(64, 1, 3, 3)
    ckpt = {"state_dict": sd, "epoch": 7, "global_step": 1234}
    path = str(tmp_path / "GATsSPG.ckpt")
    torch.save(ckpt, path)

    params = model_io.load_gats_params(path)
    direct = gats_spg_from_state_dict(ref.state_dict())
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_superglue_pth(tmp_path):
    if not conftest.reference_available():
        pytest.skip("reference not present")
    from ref_loader import load_ref_superglue
    from onepose_tpu.models.convert import superglue_from_state_dict

    torch.manual_seed(0)
    ref = load_ref_superglue()({}).eval()
    path = str(tmp_path / "superglue_outdoor.pth")
    torch.save(ref.state_dict(), path)

    params = model_io.load_superglue_params(path)
    direct = superglue_from_state_dict(ref.state_dict())
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_discovery(tmp_path):
    for e in (0, 3, 11):
        (tmp_path / f"epoch={e}").mkdir()
    assert model_io.latest_checkpoint(str(tmp_path)).endswith("epoch=11")
    assert model_io.latest_checkpoint(str(tmp_path / "nothing")) is None
