"""Mechanized fp32 matmul-precision policy (VERDICT r3 Weak #6).

TPU's default matmul precision rounds fp32 operands to bf16, which cost
the PnP solver a 2x success-rate loss before `ops/epnp.py` pinned fp32
(docs/DESIGN.md §7b). Policy: every geometric solver entry point pins
its own precision so results are invariant to the ambient
``jax.default_matmul_precision`` default.

Mechanism: ``jax.lax.dot_general`` resolves ``precision=None`` from the
ambient config *at trace time*, so a solver that pins fp32 internally
traces to an identical jaxpr under any ambient default, while an
unpinned solver's jaxpr flips between ``Precision.DEFAULT`` and
``Precision.HIGHEST`` dots. We trace each registered solver under an
ambient ``bfloat16`` default and an ambient ``float32`` default and
require byte-identical jaxprs — plus at least one HIGHEST-precision dot,
so a solver with no dots at all can't vacuously pass.

Every entry in ``onepose_tpu.ops.precision.SOLVER_REGISTRY`` must have a
case here (checked), so adding a solver to the registry without a trace
case — or vice versa — fails loudly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_tpu.ops import epnp, lk_flow, lm, similarity
from onepose_tpu.ops.precision import SOLVER_REGISTRY
from onepose_tpu.sfm import triangulate


def _case_ransac_pnp():
    rng = np.random.default_rng(0)
    n = 16
    pts3d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    pts2d = jnp.asarray(rng.uniform(100, 400, (n, 2)), jnp.float32)
    mask = jnp.ones(n, bool)
    K = jnp.asarray([[460.0, 0, 256], [0, 460.0, 256], [0, 0, 1]],
                    jnp.float32)
    key = jax.random.PRNGKey(0)
    return lambda: epnp.ransac_pnp(key, pts2d, pts3d, mask, K,
                                   num_hypotheses=8, lo_hypotheses=4)


def _case_solve_ba():
    rng = np.random.default_rng(1)
    C, P, O = 2, 5, 10
    problem = lm.BAProblem(
        cameras=jnp.asarray(rng.normal(scale=0.1, size=(C, 6)),
                            jnp.float32),
        points=jnp.asarray(rng.normal(size=(P, 3)) + [0, 0, 4],
                           jnp.float32),
        cam_idx=jnp.asarray(rng.integers(0, C, O), jnp.int32),
        pt_idx=jnp.asarray(rng.integers(0, P, O), jnp.int32),
        uv=jnp.asarray(rng.uniform(0, 512, (O, 2)), jnp.float32),
        K=jnp.broadcast_to(
            jnp.asarray([460.0, 460.0, 256.0, 256.0], jnp.float32),
            (O, 4)),
        mask=jnp.ones(O, bool),
    )
    return lambda: lm.solve_ba(problem, iterations=2)


def _case_ransac_similarity():
    rng = np.random.default_rng(2)
    n = 12
    src = jnp.asarray(rng.uniform(0, 512, (n, 2)), jnp.float32)
    dst = src + 3.0
    mask = jnp.ones(n, bool)
    key = jax.random.PRNGKey(0)
    return lambda: similarity.ransac_similarity(key, src, dst, mask,
                                                num_hypotheses=8)


def _case_pyramid_lk():
    rng = np.random.default_rng(3)
    im0 = jnp.asarray(rng.uniform(0, 1, (64, 64)), jnp.float32)
    im1 = jnp.asarray(rng.uniform(0, 1, (64, 64)), jnp.float32)
    pts = jnp.asarray(rng.uniform(20, 44, (6, 2)), jnp.float32)
    return lambda: lk_flow.pyramid_lk(im0, im1, pts, levels=2, iters=2)


def _case_triangulate_batch():
    rng = np.random.default_rng(4)
    T, M = 4, 3
    uvs = jnp.asarray(rng.uniform(0, 512, (T, M, 2)), jnp.float32)
    Ps = jnp.asarray(rng.normal(size=(T, M, 3, 4)), jnp.float32)
    mask = jnp.ones((T, M), bool)
    # Trace the PRODUCT path (the module-level jit wrapper created by
    # _triangulate_batch_host), not the raw function.
    return lambda: triangulate._triangulate_batch_host(uvs, Ps, mask)


CASES = {
    "onepose_tpu.ops.epnp.ransac_pnp": _case_ransac_pnp,
    "onepose_tpu.ops.lm.solve_ba": _case_solve_ba,
    "onepose_tpu.ops.similarity.ransac_similarity": _case_ransac_similarity,
    "onepose_tpu.ops.lk_flow.pyramid_lk": _case_pyramid_lk,
    "onepose_tpu.sfm.triangulate._triangulate_batch":
        _case_triangulate_batch,
}


def test_registry_matches_cases():
    assert set(CASES) == set(SOLVER_REGISTRY), (
        "SOLVER_REGISTRY and test cases out of sync — every geometric "
        "solver entry point needs both a pin_fp32 decorator and a trace "
        "case here")


@pytest.mark.parametrize("name", sorted(CASES))
def test_solver_trace_invariant_to_ambient_precision(name):
    thunk = CASES[name]()
    with jax.default_matmul_precision("bfloat16"):
        jaxpr_bf16 = str(jax.make_jaxpr(thunk)())
    with jax.default_matmul_precision("float32"):
        jaxpr_fp32 = str(jax.make_jaxpr(thunk)())
    assert "Precision.HIGHEST" in jaxpr_bf16, (
        f"{name}: no HIGHEST-precision dot found — either the solver "
        "lost its matmuls or the fp32 pin is gone")
    assert jaxpr_bf16 == jaxpr_fp32, (
        f"{name}: traced program depends on the ambient matmul-precision "
        "default — a dot inside the solver is not pinned to fp32 "
        "(decorate the entry point with ops.precision.pin_fp32; see "
        "docs/DESIGN.md §7b)")
