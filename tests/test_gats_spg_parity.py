"""Behavioral parity: JAX GATsSPG matcher vs reference torch GATsSuperGlue
with identical converted weights on identical inputs."""
import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not conftest.reference_available(), reason="reference repo not present"
)

HPARAMS = {
    "descriptor_dim": 256,
    "keypoints_encoder": [32, 64, 128],
    "include_self": True,
    "additional": False,
    "with_linear_transform": False,
    "match_type": "softmax",
    "scale_factor": 0.07,
    "match_threshold": 0.2,
}


@pytest.fixture(scope="module")
def models():
    from ref_loader import load_ref_gats_spg
    from onepose_tpu.models.convert import gats_spg_from_state_dict

    RefModel = load_ref_gats_spg()
    torch.manual_seed(0)
    ref = RefModel(HPARAMS).eval()
    params = gats_spg_from_state_dict(ref.state_dict())
    return ref, params


def _make_inputs(rng, b=2, n1=32, n2=16, leaf=4, d=256):
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    return {
        "keypoints2d": rng.uniform(0, 512, (b, n1, 2)).astype(np.float32),
        "keypoints3d": rng.normal(size=(b, n2, 3)).astype(np.float32),
        "descriptors2d_query": unit(
            rng.normal(size=(b, n1, d))).astype(np.float32),
        "descriptors3d_db": unit(
            rng.normal(size=(b, n2, d))).astype(np.float32),
        "descriptors2d_db": unit(
            rng.normal(size=(b, n2 * leaf, d))).astype(np.float32),
        "scores2d_query": rng.uniform(0, 1, (b, n1, 1)).astype(np.float32),
        "scores3d_db": rng.uniform(0, 1, (b, n2, 1)).astype(np.float32),
        "scores2d_db": rng.uniform(0, 1, (b, n2 * leaf, 1)).astype(np.float32),
    }


def test_forward_parity(models):
    from onepose_tpu.models import gats_spg

    ref, params = models
    rng = np.random.default_rng(0)
    data_np = _make_inputs(rng)

    torch_data = {
        k: torch.from_numpy(
            v.transpose(0, 2, 1) if k.startswith("descriptors") else v
        )
        for k, v in data_np.items()
    }
    with torch.no_grad():
        pred_ref, conf_ref = ref(torch_data)

    out = gats_spg.match(params, {
        "descriptors2d_query": data_np["descriptors2d_query"],
        "descriptors3d_db": data_np["descriptors3d_db"],
        "descriptors2d_db": data_np["descriptors2d_db"],
    }, {"scale_factor": 0.07, "match_threshold": 0.2})

    np.testing.assert_allclose(
        np.asarray(out.conf_matrix), conf_ref.numpy(), atol=5e-5)
    # batch element 0 comparisons (reference returns [0] slices)
    np.testing.assert_array_equal(
        np.asarray(out.matches0[0]), pred_ref["matches0"].numpy())
    np.testing.assert_array_equal(
        np.asarray(out.matches1[0]), pred_ref["matches1"].numpy())
    np.testing.assert_allclose(
        np.asarray(out.matching_scores0[0]),
        pred_ref["matching_scores0"].numpy(), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.matching_scores1[0]),
        pred_ref["matching_scores1"].numpy(), atol=5e-5)


def test_gats_layer_parity(models):
    """The leaf-attention layer alone, on its own input shapes."""
    from onepose_tpu.models import gats_spg

    ref, params = models
    layer_ref = ref.gnn.layers[0]
    p = params["gnn"][0]

    rng = np.random.default_rng(1)
    b, n1, leaf, d = 2, 8, 4, 256
    h2d = rng.normal(size=(b, n1 * leaf, d)).astype(np.float32)
    h3d = rng.normal(size=(b, n1, d)).astype(np.float32)

    with torch.no_grad():
        out_ref = layer_ref(
            torch.from_numpy(h2d), torch.from_numpy(h3d)).numpy()
    cfg = dict(gats_spg.DEFAULT_CONFIG)
    out = np.asarray(gats_spg.gats_layer(p, h2d, h3d, cfg))
    np.testing.assert_allclose(out, out_ref, atol=1e-5)


def test_mask_blocks_padded_matches(models):
    """Padded 2D slots must never produce a match when masked."""
    from onepose_tpu.models import gats_spg

    _, params = models
    rng = np.random.default_rng(2)
    data = _make_inputs(rng, b=1)
    mask2d = np.ones((1, 32), bool)
    mask2d[0, 20:] = False
    out = gats_spg.match(params, {
        "descriptors2d_query": data["descriptors2d_query"],
        "descriptors3d_db": data["descriptors3d_db"],
        "descriptors2d_db": data["descriptors2d_db"],
        "mask2d": mask2d,
    })
    m0 = np.asarray(out.matches0[0])
    assert (m0[20:] == -1).all()
