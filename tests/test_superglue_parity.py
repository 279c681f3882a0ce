"""Behavioral parity: JAX SuperGlue vs reference torch module with identical
converted weights."""
import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not conftest.reference_available(), reason="reference repo not present"
)


@pytest.fixture(scope="module")
def models():
    from ref_loader import load_ref_superglue
    from onepose_tpu.models.convert import superglue_from_state_dict

    RefSG = load_ref_superglue()
    torch.manual_seed(0)
    # 'weights' key absent → module keeps its random init (the reference
    # class only stores config; loading happens externally).
    ref = RefSG({"match_threshold": 0.2,
                 "sinkhorn_iterations": 30}).eval()
    params = superglue_from_state_dict(ref.state_dict())
    return ref, params


def _make_pair(rng, b=1, n0=24, n1=32, d=256, h=480, w=640):
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    return {
        "keypoints0": rng.uniform(0, [w, h], (b, n0, 2)).astype(np.float32),
        "keypoints1": rng.uniform(0, [w, h], (b, n1, 2)).astype(np.float32),
        "descriptors0": unit(rng.normal(size=(b, n0, d))).astype(np.float32),
        "descriptors1": unit(rng.normal(size=(b, n1, d))).astype(np.float32),
        "scores0": rng.uniform(0, 1, (b, n0)).astype(np.float32),
        "scores1": rng.uniform(0, 1, (b, n1)).astype(np.float32),
        "shape0": (h, w),
        "shape1": (h, w),
    }


def test_forward_parity(models):
    from onepose_tpu.models import superglue as sg

    ref, params = models
    rng = np.random.default_rng(0)
    data = _make_pair(rng)
    h, w = data["shape0"]

    torch_data = {
        "keypoints0": torch.from_numpy(data["keypoints0"]),
        "keypoints1": torch.from_numpy(data["keypoints1"]),
        "descriptors0": torch.from_numpy(
            data["descriptors0"].transpose(0, 2, 1)),
        "descriptors1": torch.from_numpy(
            data["descriptors1"].transpose(0, 2, 1)),
        "scores0": torch.from_numpy(data["scores0"]),
        "scores1": torch.from_numpy(data["scores1"]),
        "image0": torch.zeros(1, 1, h, w),
        "image1": torch.zeros(1, 1, h, w),
    }
    with torch.no_grad():
        out_ref = ref(torch_data)

    out = sg.match(params, data, {"sinkhorn_iterations": 30})
    np.testing.assert_array_equal(
        np.asarray(out.matches0), out_ref["matches0"].numpy())
    np.testing.assert_array_equal(
        np.asarray(out.matches1), out_ref["matches1"].numpy())
    np.testing.assert_allclose(
        np.asarray(out.matching_scores0),
        out_ref["matching_scores0"].numpy(), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.matching_scores1),
        out_ref["matching_scores1"].numpy(), atol=5e-5)


def test_self_matching_recovers_identity(models):
    """Matching a point set against itself must yield the identity assignment
    for well-separated descriptors."""
    from onepose_tpu.models import superglue as sg

    _, params = models
    rng = np.random.default_rng(1)
    data = _make_pair(rng, n0=16, n1=16)
    data["keypoints1"] = data["keypoints0"].copy()
    data["descriptors1"] = data["descriptors0"].copy()
    data["scores1"] = data["scores0"].copy()
    out = sg.match(params, data, {"sinkhorn_iterations": 30,
                                  "match_threshold": 0.0})
    m0 = np.asarray(out.matches0[0])
    matched = m0 >= 0
    assert matched.sum() >= 12  # most points self-match
    np.testing.assert_array_equal(
        m0[matched], np.arange(16)[matched])


def test_masked_padding_never_matches(models):
    """Padded keypoint slots (mask=False) must route to the dustbin and
    never appear in the match output."""
    from onepose_tpu.models import superglue as sg

    _, params = models
    rng = np.random.default_rng(2)
    data = _make_pair(rng, n0=32, n1=32)
    mask0 = np.ones((1, 32), bool)
    mask0[0, 24:] = False
    mask1 = np.ones((1, 32), bool)
    mask1[0, 28:] = False
    data["mask0"] = mask0
    data["mask1"] = mask1
    out = sg.match(params, data, {"sinkhorn_iterations": 30,
                                  "match_threshold": 0.0})
    m0 = np.asarray(out.matches0[0])
    m1 = np.asarray(out.matches1[0])
    assert (m0[24:] == -1).all()
    assert (m1[28:] == -1).all()
    # no valid slot may match into a masked slot
    assert not np.isin(m0[m0 >= 0], np.arange(28, 32)).any()
    assert not np.isin(m1[m1 >= 0], np.arange(24, 32)).any()
