"""Behavioral parity: JAX SuperPoint vs the reference torch module with
identical (randomly initialized, converted) weights."""
import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not conftest.reference_available(), reason="reference repo not present"
)


@pytest.fixture(scope="module")
def models():
    from ref_loader import load_ref_superpoint
    from onepose_tpu.models import superpoint as sp
    from onepose_tpu.models.convert import superpoint_from_state_dict

    RefSP = load_ref_superpoint()
    torch.manual_seed(0)
    config = {"max_keypoints": 256, "keypoint_threshold": 0.005}
    ref = RefSP(config).eval()
    params = superpoint_from_state_dict(
        {k: v for k, v in ref.state_dict().items()})
    return ref, params, config, sp


def _rand_image(rng, h=64, w=96):
    return rng.uniform(0.0, 1.0, (1, 1, h, w)).astype(np.float32)


def test_dense_heads_parity(models):
    ref, params, config, sp = models
    rng = np.random.default_rng(0)
    img = _rand_image(rng)

    with torch.no_grad():
        x = torch.from_numpy(img)
        t = ref.relu(ref.conv1a(x))
        t = ref.relu(ref.conv1b(t))
        t = ref.pool(t)
        t = ref.relu(ref.conv2a(t))
        t = ref.relu(ref.conv2b(t))
        t = ref.pool(t)
        t = ref.relu(ref.conv3a(t))
        t = ref.relu(ref.conv3b(t))
        t = ref.pool(t)
        t = ref.relu(ref.conv4a(t))
        t = ref.relu(ref.conv4b(t))
        cpa = ref.relu(ref.convPa(t))
        scores_t = torch.softmax(ref.convPb(cpa), 1)[:, :-1]
        b, _, hc, wc = scores_t.shape
        scores_t = scores_t.permute(0, 2, 3, 1).reshape(b, hc, wc, 8, 8)
        scores_t = scores_t.permute(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
        cda = ref.relu(ref.convDa(t))
        desc_t = ref.convDb(cda)
        desc_t = torch.nn.functional.normalize(desc_t, p=2, dim=1)

    scores_j, desc_j = sp.dense_heads(
        params, img.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(scores_j), scores_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(desc_j), desc_t.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_nms_parity(models):
    _, _, _, sp = models
    from ref_loader import load_ref_superpoint  # module already imported
    import ref_superpoint

    rng = np.random.default_rng(1)
    scores = rng.uniform(0, 1, (2, 48, 48)).astype(np.float32)
    ref_out = ref_superpoint.simple_nms(torch.from_numpy(scores), 4).numpy()
    jax_out = np.asarray(sp.simple_nms(scores, 4))
    np.testing.assert_allclose(jax_out, ref_out, atol=1e-7)


def test_keypoint_set_parity(models):
    ref, params, config, sp = models
    rng = np.random.default_rng(2)
    img = _rand_image(rng, 64, 64)

    # The reference picks grid_sample align_corners by parsing
    # torch.__version__[2] (superpoint.py:87), which selects True under its
    # pinned torch 1.8 but False under modern torch. Pin the reference
    # behavior (align_corners=True) for the comparison.
    import unittest.mock
    real_grid_sample = torch.nn.functional.grid_sample

    def pinned_grid_sample(inp, grid, mode="bilinear", **kwargs):
        return real_grid_sample(inp, grid, mode=mode, align_corners=True)

    with torch.no_grad(), unittest.mock.patch.object(
            torch.nn.functional, "grid_sample", pinned_grid_sample):
        out_ref = ref(torch.from_numpy(img))
    kpts_ref = out_ref["keypoints"][0].numpy()       # [M, 2] (x, y)
    scores_ref = out_ref["scores"][0].numpy()
    desc_ref = out_ref["descriptors"][0].numpy().T   # [M, 256]

    out = sp.extract(params, img.transpose(0, 2, 3, 1),
                     {"max_keypoints": 256})
    mask = np.asarray(out.mask[0])
    kpts = np.asarray(out.keypoints[0])[mask]
    scores = np.asarray(out.scores[0])[mask]
    desc = np.asarray(out.descriptors[0])[mask]

    assert kpts.shape[0] == kpts_ref.shape[0], (
        f"{kpts.shape[0]} vs {kpts_ref.shape[0]} keypoints")

    # Compare as sets (ordering differs: nonzero-scan vs top-k).
    order_ref = np.lexsort((kpts_ref[:, 0], kpts_ref[:, 1]))
    order = np.lexsort((kpts[:, 0], kpts[:, 1]))
    np.testing.assert_array_equal(kpts[order], kpts_ref[order_ref])
    np.testing.assert_allclose(
        scores[order], scores_ref[order_ref], atol=1e-6)
    np.testing.assert_allclose(
        desc[order], desc_ref[order_ref], atol=2e-5)


def test_topk_budget_truncates(models):
    ref, params, config, sp = models
    rng = np.random.default_rng(3)
    img = _rand_image(rng, 64, 64)
    out = sp.extract(params, img.transpose(0, 2, 3, 1),
                     {"max_keypoints": 8})
    mask = np.asarray(out.mask[0])
    assert mask.sum() <= 8
    # top-8 must be the highest-scoring of the full extraction
    full = sp.extract(params, img.transpose(0, 2, 3, 1),
                      {"max_keypoints": 256})
    full_scores = np.sort(
        np.asarray(full.scores[0])[np.asarray(full.mask[0])])[::-1]
    got = np.sort(np.asarray(out.scores[0])[mask])[::-1]
    np.testing.assert_allclose(got, full_scores[: mask.sum()], atol=1e-7)


def test_polyphase_stem_matches_direct():
    """The space-to-depth stem is the same math as the direct convs
    (fp reassociation only), end to end through keypoint selection."""
    import jax
    import jax.numpy as jnp

    from onepose_tpu.models import superpoint

    rng = np.random.default_rng(7)
    params = superpoint.init_params(jax.random.PRNGKey(3))
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32))

    s_d, d_d = superpoint.dense_heads(params, img, stem="direct")
    s_p, d_p = superpoint.dense_heads(params, img, stem="polyphase")
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_p), atol=2e-6)
    np.testing.assert_allclose(np.asarray(d_d), np.asarray(d_p), atol=2e-6)

    cfg = {"max_keypoints": 64}
    o_d = superpoint.extract(params, img, {**cfg, "stem": "direct"})
    o_p = superpoint.extract(params, img, {**cfg, "stem": "polyphase"})
    assert bool(jnp.all(o_d.keypoints == o_p.keypoints))
    assert bool(jnp.all(o_d.mask == o_p.mask))


def test_direct_bf16_stem_close_to_fp32():
    """The inference-surface default (stem=direct, stem_dtype=bfloat16 —
    gate-validated on chip, DESIGN §6d) must stay a small perturbation of
    the fp32 path on CPU too: same shapes, dense scores within bf16
    rounding, keypoint sets nearly identical."""
    import jax
    import jax.numpy as jnp

    from onepose_tpu.models import superpoint

    rng = np.random.default_rng(7)
    params = superpoint.init_params(jax.random.PRNGKey(3))
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32))

    s32, d32 = superpoint.dense_heads(params, img, stem="direct")
    s16, d16 = superpoint.dense_heads(params, img, stem="direct",
                                      stem_dtype="bfloat16")
    assert s16.dtype == jnp.float32 and d16.dtype == jnp.float32
    # stem output magnitudes are O(1); bf16 relative error ~2^-8 per conv
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=5e-2)

    cfg = {"max_keypoints": 64}
    o32 = superpoint.extract(params, img, {**cfg, "stem": "direct"})
    o16 = superpoint.extract(
        params, img,
        {**cfg, "stem": "direct", "stem_dtype": "bfloat16"})
    a = {tuple(k) for k, m in zip(np.asarray(o32.keypoints[0]),
                                  np.asarray(o32.mask[0])) if m}
    b = {tuple(k) for k, m in zip(np.asarray(o16.keypoints[0]),
                                  np.asarray(o16.mask[0])) if m}
    assert len(a & b) / max(len(a | b), 1) > 0.9


def test_nms_aware_top_k_exact():
    """The two-stage NMS-aware top-k must equal the flat top_k on any
    post-NMS score map (same values AND same indices for valid slots)."""
    import numpy as np
    import jax.numpy as jnp
    import jax

    from onepose_tpu.models.superpoint import _nms_aware_top_k, simple_nms

    rng = np.random.default_rng(3)
    h, w, k, r = 128, 256, 200, 4
    dense = jnp.asarray(rng.random((1, h, w)).astype(np.float32) ** 4)
    nms = np.asarray(simple_nms(dense, r))[0]
    masked = jnp.asarray(np.where(nms > 0.005, nms, -1.0))

    v2, i2 = jax.jit(
        lambda m: _nms_aware_top_k(m, k, r, True))(masked)
    v1, i1 = jax.jit(
        lambda m: _nms_aware_top_k(m, k, r, False))(masked)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    valid = np.asarray(v1) > 0
    np.testing.assert_array_equal(
        np.asarray(i1)[valid], np.asarray(i2)[valid])


def test_separable_nms_matches_dense_window():
    """Separable rows+cols max-pool NMS equals the reference's single
    (2r+1)^2-window recurrence bit-for-bit."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from onepose_tpu.models.superpoint import simple_nms

    def maxpool_dense(x, radius):
        kk = 2 * radius + 1
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, kk, kk), (1, 1, 1),
            ((0, 0), (radius, radius), (radius, radius)))

    def nms_dense(scores, r):
        zeros = jnp.zeros_like(scores)
        max_mask = scores == maxpool_dense(scores, r)
        for _ in range(2):
            supp = maxpool_dense(max_mask.astype(scores.dtype), r) > 0
            ss = jnp.where(supp, zeros, scores)
            nm = ss == maxpool_dense(ss, r)
            max_mask = max_mask | (nm & (~supp))
        return jnp.where(max_mask, scores, zeros)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 96)).astype(np.float32))
    for r in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(simple_nms(x, r)), np.asarray(nms_dense(x, r)))


def test_two_stage_topk_tie_safe():
    """Adversarial tie plateaus (VERDICT r4 Next #6): a flat constant-score
    region survives simple_nms at EVERY pixel (ties pass scores ==
    maxpool), flooding chunks past the NMS spacing bound. The r5
    truncation-certificate guard must detect this and fall back to the
    flat top_k — two-stage output bit-equal to flat on every adversarial
    map, values AND indices (tie order included)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from onepose_tpu.models.superpoint import _nms_aware_top_k, simple_nms

    h, w, k, r = 64, 128, 200, 4

    def cases():
        # (a) the r4 caveat map: one saturated band + isolated peaks
        d = np.full((1, h, w), 0.01, np.float32)
        d[0, 8:24, :] = 0.5
        d[0, 40, 10:20:2] = 0.3
        yield d
        # (b) whole map one tied plateau above threshold
        yield np.full((1, h, w), 0.7, np.float32)
        # (c) tie group EXACTLY straddling the k boundary, spread
        # across chunks
        d = np.full((1, h, w), 0.0, np.float32)
        d[0, ::8, ::8] = 0.25          # 8*16 = 128 tied survivors
        d[0, 1::16, 4::32] = 0.9       # 16 distinct-ish high peaks
        yield d
        # (d) plateau below threshold only (guard must NOT trip: the
        # boundary values are invalid)
        d = np.full((1, h, w), 0.001, np.float32)
        d[0, 8::16, 8::16] = np.linspace(
            0.1, 0.9, len(range(8, h, 16)) * len(range(8, w, 16))
        ).reshape(len(range(8, h, 16)), len(range(8, w, 16)))
        yield d

    for ci, dense in enumerate(cases()):
        nms = np.asarray(simple_nms(jnp.asarray(dense), r))[0]
        masked = jnp.asarray(np.where(nms > 0.05, nms, -1.0))
        v_flat, i_flat = jax.jit(
            lambda m: _nms_aware_top_k(m, k, r, False))(masked)
        v_two, i_two = jax.jit(
            lambda m: _nms_aware_top_k(m, k, r, True))(masked)
        np.testing.assert_array_equal(
            np.asarray(v_flat), np.asarray(v_two),
            err_msg=f"case {ci}: values diverge")
        valid = np.asarray(v_flat) > 0
        np.testing.assert_array_equal(
            np.asarray(i_flat)[valid], np.asarray(i_two)[valid],
            err_msg=f"case {ci}: indices diverge (tie order)")
