"""Run loggers: CSV + TensorBoard + optional Weights & Biases.

Counterpart of the reference Loggers (utils/loggers/__init__.py:33-156):
results.csv with the same 13-key schema, TensorBoard scalars via
tf.summary (TF is the bundled backend; no torch), W&B when installed.
The reference force-disables W&B (train.py:80, a defect) — here it is
simply optional.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

from yolosomi_tpu.utils.general import LOGGER

RESULT_KEYS = [
    "train/box_loss",
    "train/obj_loss",
    "train/cls_loss",
    "metrics/precision",
    "metrics/recall",
    "metrics/mAP_0.5",
    "metrics/mAP_0.5:0.95",
    "val/box_loss",
    "val/obj_loss",
    "val/cls_loss",
    "x/lr0",
    "x/lr1",
    "x/lr2",
]


class Loggers:
    def __init__(self, save_dir, include=("csv", "tb")):
        self.save_dir = Path(save_dir)
        self.csv_path = self.save_dir / "results.csv"
        self.tb = None
        self.wandb = None
        if "tb" in include:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(str(self.save_dir))
                LOGGER.info(f"TensorBoard: tensorboard --logdir {self.save_dir.parent}")
            except Exception as e:
                LOGGER.warning(f"TensorBoard unavailable: {e}")
        if "wandb" in include:
            try:
                import wandb

                self.wandb = wandb.init(project=self.save_dir.parent.name, name=self.save_dir.name)
            except Exception:
                self.wandb = None

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        # CSV row (reference schema: loggers/__init__.py:109-117)
        keys = list(metrics.keys())
        header = not self.csv_path.exists()
        with open(self.csv_path, "a") as f:
            if header:
                f.write("epoch," + ",".join(keys) + "\n")
            f.write(f"{step}," + ",".join(f"{metrics[k]:.6g}" for k in keys) + "\n")
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)
                self.tb.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_images(self, name: str, images, step: int = 0) -> None:
        if self.tb is not None:
            import numpy as np
            import tensorflow as tf

            with self.tb.as_default():
                tf.summary.image(name, np.asarray(images), step=step, max_outputs=8)
                self.tb.flush()

    def finish(self) -> None:
        if self.wandb is not None:
            self.wandb.finish()
