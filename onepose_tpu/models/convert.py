"""Convert reference PyTorch checkpoints to onepose_tpu parameter pytrees.

Handles the three reference model families:
- SuperPoint ``superpoint_v1.pth`` (Magic Leap),
- SuperGlue ``superglue_{indoor,outdoor}.pth``,
- GATsSPG ``GATsSPG.ckpt`` (PyTorch Lightning; 'matcher.' prefixes stripped,
  mirroring /root/reference/src/utils/model_io.py:93-126).

Layout conversions: torch Conv2d OIHW → JAX HWIO; torch Conv1d(k=1)
[out,in,1] → dense [in,out]; token axis moves from [B,D,N] to [B,N,D].
Works from a loaded state dict (mapping name → array-like); ``torch`` is only
imported when a file path is given.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_state_dict(path: str, strip_prefixes=("matcher.", "model.")):
    """Load a .pth/.ckpt file into a flat numpy state dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        for p in strip_prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = _np(v)
    return out


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------

def superpoint_from_state_dict(sd: Mapping[str, np.ndarray]) -> Dict:
    params = {}
    for name in ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"):
        w = _np(sd[f"{name}.weight"])  # [O, I, kH, kW]
        b = _np(sd[f"{name}.bias"])
        params[name] = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "b": jnp.asarray(b),
        }
    return params


# ---------------------------------------------------------------------------
# Shared 1x1-conv helpers
# ---------------------------------------------------------------------------

def _conv1d(sd, name):
    w = _np(sd[f"{name}.weight"])  # [out, in, 1]
    b = _np(sd[f"{name}.bias"])
    return {"w": jnp.asarray(w[:, :, 0].T), "b": jnp.asarray(b)}


def _bn(sd, name):
    return {
        "gamma": jnp.asarray(_np(sd[f"{name}.weight"])),
        "beta": jnp.asarray(_np(sd[f"{name}.bias"])),
        "mean": jnp.asarray(_np(sd[f"{name}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{name}.running_var"])),
    }


def _mlp_bn(sd, prefix, n_convs):
    """torch MLP Sequential [Conv, BN, ReLU]*k + Conv → list of layer dicts."""
    layers = []
    seq_idx = 0
    for i in range(n_convs):
        entry = {"lin": _conv1d(sd, f"{prefix}.{seq_idx}")}
        seq_idx += 1
        if i < n_convs - 1:
            entry["bn"] = _bn(sd, f"{prefix}.{seq_idx}")
            seq_idx += 2  # skip BN + ReLU slots
        layers.append(entry)
    return layers


# ---------------------------------------------------------------------------
# GATsSPG
# ---------------------------------------------------------------------------

def gats_spg_from_state_dict(sd: Mapping[str, np.ndarray],
                             num_blocks: int = 4) -> Dict:
    layers = []
    for i in range(3 * num_blocks):
        base = f"gnn.layers.{i}"
        if i % 3 == 0:
            layers.append({
                "W": jnp.asarray(_np(sd[f"{base}.W"])),       # [in, out]
                "a": jnp.asarray(_np(sd[f"{base}.a"])),       # [2*out, 1]
            })
        else:
            layers.append({
                "proj_q": _conv1d(sd, f"{base}.attn.proj.0"),
                "proj_k": _conv1d(sd, f"{base}.attn.proj.1"),
                "proj_v": _conv1d(sd, f"{base}.attn.proj.2"),
                "merge": _conv1d(sd, f"{base}.attn.merge"),
                # mlp Sequential: [Conv1d, InstanceNorm1d(no params), ReLU,
                # Conv1d] → indices 0 and 3
                "mlp0": _conv1d(sd, f"{base}.mlp.0"),
                "mlp1": _conv1d(sd, f"{base}.mlp.3"),
            })
    return {"gnn": layers, "final_proj": _conv1d(sd, "final_proj")}


# ---------------------------------------------------------------------------
# SuperGlue
# ---------------------------------------------------------------------------

def superglue_from_state_dict(sd: Mapping[str, np.ndarray],
                              num_gnn_layers: int = 18,
                              num_kenc_convs: int = 5) -> Dict:
    gnn = []
    for i in range(num_gnn_layers):
        base = f"gnn.layers.{i}"
        gnn.append({
            "proj_q": _conv1d(sd, f"{base}.attn.proj.0"),
            "proj_k": _conv1d(sd, f"{base}.attn.proj.1"),
            "proj_v": _conv1d(sd, f"{base}.attn.proj.2"),
            "merge": _conv1d(sd, f"{base}.attn.merge"),
            # mlp Sequential: [Conv1d, BatchNorm1d, ReLU, Conv1d]
            "mlp": _mlp_bn(sd, f"{base}.mlp", 2),
        })
    return {
        "kenc": _mlp_bn(sd, "kenc.encoder", num_kenc_convs),
        "gnn": gnn,
        "final_proj": _conv1d(sd, "final_proj"),
        "bin_score": jnp.asarray(_np(sd["bin_score"])),
    }
