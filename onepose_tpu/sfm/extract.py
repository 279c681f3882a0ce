"""SfM feature extraction: batched SuperPoint over the image list → HDF5.

Artifact-compatible with the reference
(/root/reference/src/sfm/extract_features.py:29-60): one HDF5 group per image
path with datasets keypoints [N,2], descriptors [D,N], scores [N],
image_size [2]. TPU-first: frames are batched (the reference runs one forward
per image), static keypoint budget with the padding stripped at write time.

Note on the extraction config: the reference's conf passes
``keypoints_threshold: 0.6`` which does NOT match the model's
``keypoint_threshold`` key (extract_features.py:23 vs superpoint.py:106), so
the effective threshold is the 0.005 default. We reproduce the *effective*
behavior and say so here.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

CONFS = {
    "superpoint": {
        "output": "feats-superpoint",
        "preprocessing": {"grayscale": True, "resize_h": 512,
                          "resize_w": 512},
        "conf": {
            "descriptor_dim": 256,
            "nms_radius": 3,
            "max_keypoints": 4096,
            # effective value; see module docstring
            "keypoint_threshold": 0.005,
        },
    }
}


def load_gray(img_path: str, resize_hw=None) -> np.ndarray:
    import cv2

    img = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(img_path)
    if resize_hw is not None and tuple(img.shape[:2]) != tuple(resize_hw):
        img = cv2.resize(img, (resize_hw[1], resize_hw[0]),
                         interpolation=cv2.INTER_LINEAR)
    return img.astype(np.float32) / 255.0


def extract_to_h5(sp_params, img_lists: List[str], feature_out: str,
                  conf: Optional[dict] = None, batch_size: int = 16,
                  images: Optional[Dict[str, np.ndarray]] = None,
                  mesh=None):
    """Extract features for every image path in ``img_lists`` into
    ``feature_out`` (HDF5). ``images`` optionally supplies preloaded
    grayscale arrays keyed by path (for tests / in-memory pipelines).

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — frame
    batches shard over it and SuperPoint runs SPMD across the mesh
    (batch_size must be a multiple of the data-axis size; tail chunks
    are padded by repetition and sliced after)."""
    import h5py
    import jax
    import jax.numpy as jnp

    from onepose_tpu.models import superpoint

    conf = conf or CONFS["superpoint"]
    prep = conf["preprocessing"]
    resize_hw = (prep["resize_h"], prep["resize_w"])
    sp_cfg = dict(conf["conf"])
    sp_cfg.pop("descriptor_dim", None)
    sp_cfg = superpoint.resolve_fused_stem(sp_cfg)

    put = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis "
                f"{mesh.shape['data']}")
        rep = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        sp_params = jax.tree.map(
            lambda t: jax.device_put(jnp.asarray(t), rep), sp_params)
        put = lambda t: jax.device_put(  # noqa: E731
            jnp.asarray(t), data_sh)

    with h5py.File(feature_out, "w") as f:
        for start in range(0, len(img_lists), batch_size):
            chunk = img_lists[start:start + batch_size]
            arrs = []
            for p in chunk:
                if images is not None and p in images:
                    im = np.asarray(images[p], np.float32)
                else:
                    im = load_gray(p, resize_hw)
                arrs.append(im)
            sizes = [a.shape for a in arrs]
            if mesh is not None:
                while len(arrs) % mesh.shape["data"]:
                    arrs.append(arrs[-1])  # pad tail; sliced off below
            batch = np.stack(arrs)[..., None]

            out = superpoint.extract(sp_params, put(batch), sp_cfg)
            kpts = np.asarray(out.keypoints)
            scores = np.asarray(out.scores)
            descs = np.asarray(out.descriptors)
            mask = np.asarray(out.mask)

            for bi, path in enumerate(chunk):
                m = mask[bi]
                grp = f.create_group(path)
                grp.create_dataset("keypoints", data=kpts[bi][m])
                grp.create_dataset("scores", data=scores[bi][m])
                # reference stores descriptors dim-first [D, N]
                grp.create_dataset("descriptors", data=descs[bi][m].T)
                grp.create_dataset(
                    "image_size", data=np.array(sizes[bi][::-1]))
    return feature_out
