"""SfM pair matching: batched SuperGlue over covisible pairs → HDF5.

Artifact-compatible with the reference
(/root/reference/src/sfm/match_features.py:24-88): one group per pair named
``name0.replace('/','-') + '_' + name1.replace('/','-')`` with datasets
``matches0`` and ``matching_scores0``; symmetric duplicates skipped.

TPU-first: pairs are matched in *batches* (the reference runs one forward per
pair) with keypoint counts padded to shared bucket sizes so a handful of
compiled shapes serve the whole run.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CONF = {
    "sinkhorn_iterations": 100,
    "match_threshold": 0.7,  # reference SfM conf (match_features.py:8-17)
}

BUCKETS = (256, 512, 1024, 2048, 4096)


def names_to_pair(name0: str, name1: str) -> str:
    return "_".join((name0.replace("/", "-"), name1.replace("/", "-")))


def _bucket(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return BUCKETS[-1]


def _pad_feats(kpts, scores, descs, size):
    k = kpts.shape[0]
    if k > size:
        kpts, scores, descs = kpts[:size], scores[:size], descs[:size]
        k = size
    pad = size - k
    kpts = np.concatenate([kpts, np.zeros((pad, 2), np.float32)])
    scores = np.concatenate([scores, np.zeros(pad, np.float32)])
    descs = np.concatenate(
        [descs, np.ones((pad, descs.shape[1]), np.float32)])
    mask = np.zeros(size, bool)
    mask[:k] = True
    return kpts, scores, descs, mask


def match_pairs_to_h5(sg_params, pairs: Sequence[Tuple[str, str]],
                      feature_path: str, match_out: str,
                      conf: Optional[dict] = None, batch_size: int = 8,
                      mesh=None):
    """Match each (name0, name1) pair using features from ``feature_path``
    and write matches to ``match_out``.

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — pair
    batches shard over it and SuperGlue (Sinkhorn included) runs SPMD
    across the mesh (batch_size must be a multiple of the data-axis
    size; ragged chunks are padded by repetition and sliced after)."""
    import h5py
    import jax
    import jax.numpy as jnp

    from onepose_tpu.models import superglue

    sg_conf = dict(CONF)
    sg_conf.update(conf or {})

    put = jnp.asarray
    n_dev = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.shape["data"]
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis "
                f"{n_dev}")
        rep = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        sg_params = jax.tree.map(
            lambda t: jax.device_put(jnp.asarray(t), rep), sg_params)
        put = lambda t: jax.device_put(  # noqa: E731
            jnp.asarray(t), data_sh)

    # Dedup symmetric pairs (reference match_features.py:47-56).
    seen = set()
    todo = []
    for name0, name1 in pairs:
        if (name0, name1) in seen or (name1, name0) in seen:
            continue
        seen.add((name0, name1))
        todo.append((name0, name1))

    feats: Dict[str, dict] = {}
    with h5py.File(feature_path, "r") as ff:
        def get(name):
            if name not in feats:
                g = ff[name]
                feats[name] = {
                    "keypoints": g["keypoints"][()].astype(np.float32),
                    "scores": g["scores"][()].astype(np.float32),
                    "descriptors": g["descriptors"][()].astype(np.float32).T,
                    "image_size": g["image_size"][()],
                }
            return feats[name]

        for name0, name1 in todo:
            get(name0)
            get(name1)

    # Group by (bucket0, bucket1, shapes) for batched compiles.
    groups: Dict[tuple, List[Tuple[str, str]]] = {}
    for name0, name1 in todo:
        b0 = _bucket(feats[name0]["keypoints"].shape[0])
        b1 = _bucket(feats[name1]["keypoints"].shape[0])
        s0 = tuple(int(v) for v in feats[name0]["image_size"][::-1])
        s1 = tuple(int(v) for v in feats[name1]["image_size"][::-1])
        groups.setdefault((b0, b1, s0, s1), []).append((name0, name1))

    with h5py.File(match_out, "w") as out:
        for (b0, b1, s0, s1), group_pairs in groups.items():
            for start in range(0, len(group_pairs), batch_size):
                chunk = group_pairs[start:start + batch_size]
                data = {k: [] for k in
                        ("keypoints0", "scores0", "descriptors0", "mask0",
                         "keypoints1", "scores1", "descriptors1", "mask1")}
                for name0, name1 in chunk:
                    f0, f1 = feats[name0], feats[name1]
                    k0, sc0, d0, m0 = _pad_feats(
                        f0["keypoints"], f0["scores"], f0["descriptors"], b0)
                    k1, sc1, d1, m1 = _pad_feats(
                        f1["keypoints"], f1["scores"], f1["descriptors"], b1)
                    for key, val in (("keypoints0", k0), ("scores0", sc0),
                                     ("descriptors0", d0), ("mask0", m0),
                                     ("keypoints1", k1), ("scores1", sc1),
                                     ("descriptors1", d1), ("mask1", m1)):
                        data[key].append(val)
                if mesh is not None:
                    while len(data["mask0"]) % n_dev:
                        for v in data.values():
                            v.append(v[-1])  # pad tail; sliced off below
                batch = {k: put(np.stack(v)) for k, v in data.items()}
                batch["shape0"] = s0
                batch["shape1"] = s1
                res = superglue.match(sg_params, batch, sg_conf)
                matches0 = np.asarray(res.matches0)
                mscores0 = np.asarray(res.matching_scores0)

                for bi, (name0, name1) in enumerate(chunk):
                    n0 = feats[name0]["keypoints"].shape[0]
                    grp = out.create_group(names_to_pair(name0, name1))
                    grp.create_dataset(
                        "matches0", data=matches0[bi][:n0])
                    grp.create_dataset(
                        "matching_scores0", data=mscores0[bi][:n0])
    return match_out
