"""pjit data-parallel trainer for the GATsSPG matcher.

Replaces the reference's PyTorch-Lightning loop
(/root/reference/train.py + GATsSPG_lightning_model.py:39-51,117-127):
Adam + MultiStep LR (milestones [5,10,15,20], gamma 0.5), focal loss on the
dual-softmax confidence matrix, gradient clipping 0.5, gradient accumulation
x2 — as a functional jitted train step with sharding annotations; XLA inserts
the data-parallel gradient psum over ICI.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from onepose_tpu.models import gats_spg
from onepose_tpu.train.loss import focal_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def multistep_schedule(base_lr: float, milestones_steps, gamma: float):
    """MultiStepLR: lr * gamma^(#milestones passed). Milestones in *steps*
    (callers convert epochs → steps)."""
    boundaries = {int(m): gamma for m in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(base_lr: float = 1e-3, weight_decay: float = 0.0,
                   milestones_steps=(), gamma: float = 0.5,
                   grad_clip: float = 0.5,
                   accumulate_steps: int = 1) -> optax.GradientTransformation:
    sched = multistep_schedule(base_lr, milestones_steps, gamma)
    chain = [optax.clip_by_global_norm(grad_clip)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam())
    chain.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def init_train_state(rng: jax.Array, tx: optax.GradientTransformation,
                     gats_config: Optional[dict] = None) -> TrainState:
    params = gats_spg.init_params(rng, gats_config)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def compute_loss(params, batch, gats_config: dict,
                 loss_config: Optional[dict] = None):
    """batch keys: descriptors2d_query/descriptors3d_db/descriptors2d_db
    ([B,N,D]), conf_gt [B,N1,N2] (pads encoded as negatives, reference
    convention)."""
    out = gats_spg.forward(params, batch, gats_config)
    lc = loss_config or {}
    return focal_loss(out.conf_matrix, batch["conf_gt"], **lc)


@functools.partial(jax.jit,
                   static_argnames=("tx", "gats_config_items"),
                   donate_argnums=(0,))
def train_step(state: TrainState, batch, tx, gats_config_items):
    gats_config = dict(gats_config_items)
    loss, grads = jax.value_and_grad(compute_loss)(
        state.params, batch, gats_config)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), loss


def sample_leaves_on_device(seed, counts, offsets,
                            num_leaf: int, dustbin_row):
    """On-device leaf sampling for ONE item: the jax counterpart of
    datasets.anno.sample_leaf_indices (uniform without replacement per
    point segment), so the host ships a 4-byte seed instead of running a
    ~10-30 ms/item lexsort.

    Sparse Fisher–Yates, vectorized over points: draw j ∈ [0, num_leaf)
    picks v0 uniform over the c−j not-yet-chosen values, then maps it past
    the j already-chosen ones by the monotone fixed point
    v ← v0 + #{chosen ≤ v} (converges in ≤ j steps). O(shape3d·k²)
    elementwise work — no sort, no [T]-sized tensors. The sequential
    draws are an exchangeable uniform ordered sample, so no extra slot
    shuffle is needed (the host path shuffles slots to the same
    distribution; GATs aggregation is slot-order invariant anyway).

    counts: [shape3d] per-point observation counts; offsets: [shape3d]
    segment starts in the stacked observation axis. Returns
    [shape3d, num_leaf] int32 rows into the clt stack's T+1 axis
    (dustbin_row where a point has < num_leaf observations).
    """
    counts = counts.astype(jnp.int32)
    u = jax.random.uniform(jax.random.PRNGKey(seed),
                           (num_leaf, counts.shape[0]))
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    chosen = jnp.full((num_leaf, counts.shape[0]), big, jnp.int32)
    for j in range(num_leaf):
        rem = counts - j
        v0 = jnp.clip((u[j] * rem).astype(jnp.int32), 0,
                      jnp.maximum(rem - 1, 0))
        v = v0
        for _ in range(j):
            v = v0 + jnp.sum(chosen[:j] <= v[None, :], axis=0,
                             dtype=jnp.int32)
        chosen = chosen.at[j].set(jnp.where(rem > 0, v, big))
    pick = jnp.where(chosen == big, dustbin_row,
                     offsets[None, :].astype(jnp.int32) + chosen)
    return pick.T


def materialize_light_batch(db, light, shape2d: int, shape3d: int,
                            pad_val: int = 0, num_leaf: int = 8):
    """Expand a host-light batch into the dense training batch ON DEVICE.

    db: device-resident stacks from GATsSPGDataset.device_db()
      clt_stack [O, T+1, D] (row T = dustbin ones), avg_stack [O, S3, D].
    light: obj_idx [B], leaf_idx [B, S3*L] (into the T+1 axis),
      descriptors2d_query [B, S2, D], pairs [B, P, 2] (padded with
      (shape2d, shape3d) = absent),
      num2d [B], num3d [B].

    The leaf gather ([B, S3*L, D] ≈ 16 MB/item) and the dense conf_gt
    ([S2, S3] ≈ 8 MB/item) are created here in HBM instead of being
    built on host and shipped — the host uploads ~1 MB/item.
    Matches gats_dataset.get()'s semantics exactly (dustbin = ones,
    reshape_assign_matrix scatter + pad_val regions).
    """
    obj = light["obj_idx"]
    clt = db["clt_stack"][obj]                      # [B, T+1, D]
    if "leaf_seed" in light:
        dustbin_row = db["clt_stack"].shape[1] - 1
        leaf_idx = jax.vmap(
            lambda s, cnt, off: sample_leaves_on_device(
                s, cnt, off, num_leaf, dustbin_row)
        )(light["leaf_seed"], db["count_stack"][obj],
          db["offset_stack"][obj]).reshape(obj.shape[0], -1)
    else:
        leaf_idx = light["leaf_idx"].astype(jnp.int32)
    d2db = jnp.take_along_axis(clt, leaf_idx[..., None], axis=1)
    d3db = db["avg_stack"][obj]                     # [B, S3, D]

    pairs = light["pairs"].astype(jnp.int32)        # [B, P, 2]

    def scatter_one(pr):
        conf = jnp.zeros((shape2d, shape3d), jnp.int32)
        # Pad pairs are (shape2d, shape3d): genuinely out of bounds so
        # mode="drop" discards them. (A -1 pad would wrap — JAX
        # normalizes negative indices before the OOB check.)
        return conf.at[pr[:, 0], pr[:, 1]].set(1, mode="drop")

    conf = jax.vmap(scatter_one)(pairs)             # [B, S2, S3]
    r2 = jnp.arange(shape2d)[None, :, None]
    r3 = jnp.arange(shape3d)[None, None, :]
    pad_region = (r2 >= light["num2d"][:, None, None]) \
        | (r3 >= light["num3d"][:, None, None])
    conf = jnp.where(pad_region, pad_val, conf)

    return {
        "descriptors2d_query": light["descriptors2d_query"],
        "descriptors3d_db": d3db,
        "descriptors2d_db": d2db,
        "conf_gt": conf,
    }


@functools.partial(
    jax.jit,
    static_argnames=("tx", "gats_config_items", "shape2d", "shape3d",
                     "pad_val", "num_leaf"),
    donate_argnums=(0,))
def gather_train_step(state: TrainState, light, db, tx, gats_config_items,
                      shape2d, shape3d, pad_val, num_leaf=8):
    gats_config = dict(gats_config_items)

    def loss_fn(params):
        batch = materialize_light_batch(db, light, shape2d, shape3d,
                                        pad_val, num_leaf)
        out = gats_spg.forward(params, batch, gats_config)
        return focal_loss(out.conf_matrix, batch["conf_gt"])

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), loss


def make_gather_train_step(tx: optax.GradientTransformation,
                           gats_config: Optional[dict],
                           db, shape2d: int, shape3d: int,
                           pad_val: int = 0, num_leaf: int = 8):
    """Device-resident-DB training step: step(state, light_batch).

    ``db`` arrays should already be on device (replicated under a mesh);
    light batches shard over 'data'. Light batches carrying ``leaf_seed``
    (instead of ``leaf_idx``) sample their leaves on device — the db must
    then include ``count_stack``/``offset_stack`` (device_db provides
    them).
    """
    cfg = dict(gats_spg.DEFAULT_CONFIG)
    cfg.update(gats_config or {})
    items = tuple(sorted(cfg.items()))

    def step(state, light):
        return gather_train_step(state, light, db, tx, items,
                                 shape2d, shape3d, pad_val, num_leaf)

    return step


def make_train_step(tx: optax.GradientTransformation,
                    gats_config: Optional[dict] = None):
    """Bind static args; returns step(state, batch) -> (state, loss).

    Under a Mesh, shard the batch leading axis over 'data' (see
    onepose_tpu.parallel.mesh.shard_batch) and replicate the state; jit +
    shardings make XLA emit the gradient all-reduce.
    """
    cfg = dict(gats_spg.DEFAULT_CONFIG)
    cfg.update(gats_config or {})
    items = tuple(sorted(cfg.items()))

    def step(state, batch):
        return train_step(state, batch, tx, items)

    return step
