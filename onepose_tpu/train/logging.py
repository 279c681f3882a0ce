"""Training metric logging: JSONL always; TensorBoard scalars when
TensorFlow is available; wandb mirroring when the ``wandb`` package is
importable (replaces the reference's rank-0 TensorBoard logger,
GATsSPG_lightning_model.py:49,106-115 / train_GATsSPG.yaml:96-100, and the
wandb callbacks, src/callbacks/wandb_callbacks.py:32-186 — the dependency
doesn't ship in this image, so the adapter degrades to a no-op)."""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Optional


class WandbAdapter:
    """Optional wandb mirror of the reference's callbacks
    (wandb_callbacks.py): run init with config, metric logging, checkpoint
    artifact upload (UploadCheckpointsAsArtifact role), and finish. Every
    method is a no-op when ``wandb`` isn't importable, so callers never
    need to guard."""

    def __init__(self, project: Optional[str] = None,
                 config: Optional[dict] = None,
                 log_ckpts: bool = True):
        self.run = None
        self.log_ckpts = log_ckpts
        if project is None:
            return
        try:
            import wandb
        except ImportError:
            return
        self._wandb = wandb
        self.run = wandb.init(project=project, config=config or {})

    def log(self, step: int, metrics: Dict[str, float]):
        if self.run is not None:
            self.run.log(dict(metrics), step=step)

    def log_checkpoint(self, path: str):
        """UploadCheckpointsAsArtifact equivalent
        (wandb_callbacks.py:60-78)."""
        if self.run is None or not self.log_ckpts:
            return
        art = self._wandb.Artifact(
            f"ckpt-{self.run.id}", type="checkpoints")
        if osp.isdir(path):
            art.add_dir(path)
        else:
            art.add_file(path)
        self.run.log_artifact(art)

    def finish(self):
        if self.run is not None:
            self.run.finish()
            self.run = None


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 wandb_project: Optional[str] = None,
                 wandb_config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(osp.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        self.wandb = WandbAdapter(wandb_project, wandb_config)
        if use_tensorboard:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(
                    osp.join(log_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        self.jsonl.write(json.dumps({"step": step, **metrics}) + "\n")
        self.jsonl.flush()
        self.wandb.log(step, metrics)
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in metrics.items():
                    if isinstance(v, (int, float)):
                        tf.summary.scalar(k, v, step=step)
                self.tb.flush()

    def log_checkpoint(self, path: str):
        self.wandb.log_checkpoint(path)

    def close(self):
        self.jsonl.close()
        self.wandb.finish()
