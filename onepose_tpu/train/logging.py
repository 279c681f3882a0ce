"""Training metric logging: JSONL always; TensorBoard scalars when
TensorFlow is available (replaces the reference's rank-0 TensorBoard logger,
GATsSPG_lightning_model.py:49,106-115 / train_GATsSPG.yaml:96-100; the wandb
callbacks have no counterpart dependency in this image)."""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(osp.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
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
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in metrics.items():
                    if isinstance(v, (int, float)):
                        tf.summary.scalar(k, v, step=step)
                self.tb.flush()

    def close(self):
        self.jsonl.close()
