"""W&B artifact / dataset / bbox-debug plane.

Counterpart of the reference's full WandbLogger
(utils/loggers/wandb/wandb_utils.py:108-516): checkpoint artifacts with
latest/best aliases and epoch/fitness metadata, dataset-as-artifact
upload with a browsable image+bbox Table, resume-from-artifact
(`wandb-artifact://` weight paths), and per-val-image bounding-box debug
panels. The reference force-disables its own plane (train.py:80); here it
activates whenever the wandb package is importable and degrades to a
silent no-op otherwise — every method is safe to call unconditionally.

The module-level `wandb` binding is injectable (tests install a stub) —
the same pattern the reference uses for its optional import
(wandb_utils.py:18-25).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

from yolosomi_tpu.utils.general import LOGGER

try:  # pragma: no cover - exercised via stub in tests
    import wandb
except Exception:  # ImportError or any wandb-internal init failure
    wandb = None

WANDB_ARTIFACT_PREFIX = "wandb-artifact://"


def is_wandb_artifact(path) -> bool:
    return isinstance(path, str) and path.startswith(WANDB_ARTIFACT_PREFIX)


class WandbLogger:
    """Artifact-level W&B integration. Construct once per run; every
    method no-ops when wandb is absent or init failed."""

    def __init__(self, opt=None, run_id: Optional[str] = None, job_type: str = "Training",
                 project: str = "yolosomi_tpu", name: Optional[str] = None):
        self.run = None
        self.val_table = None
        self._panel_rows = []
        if wandb is None:
            return
        try:
            self.run = wandb.run or wandb.init(
                project=project, name=name, id=run_id,
                resume="allow" if run_id else None, job_type=job_type,
                config=vars(opt) if opt is not None else None,
            )
        except Exception as e:  # pragma: no cover
            LOGGER.warning(f"wandb init failed: {e}")
            self.run = None

    # -- checkpoint artifacts (reference: log_model, wandb_utils.py:298-320)

    def log_checkpoint(self, path, epoch: int, fitness: float, best: bool = False) -> None:
        """Save a checkpoint file as a 'model' artifact with latest/best
        aliases and epoch/fitness metadata."""
        if self.run is None:
            return
        art = wandb.Artifact(
            f"run_{self.run.id}_model", type="model",
            metadata={"epoch": epoch, "fitness": float(fitness), "best": bool(best)},
        )
        art.add_file(str(path), name=Path(path).name)
        aliases = ["latest", f"epoch{epoch}"] + (["best"] if best else [])
        self.run.log_artifact(art, aliases=aliases)

    def resume_checkpoint(self, weights: str, download_dir=".") -> Optional[str]:
        """Resolve a `wandb-artifact://entity/project/name:alias` weights
        path to a downloaded local checkpoint file (reference:
        download_model_artifact, wandb_utils.py:280-296). Returns None for
        non-artifact paths."""
        if not is_wandb_artifact(weights):
            return None
        if self.run is None:
            raise RuntimeError("wandb-artifact:// weights need the wandb package")
        ref = weights[len(WANDB_ARTIFACT_PREFIX):]
        art = self.run.use_artifact(ref)
        root = art.download(root=str(download_dir))
        files = sorted(Path(root).glob("*"))
        ckpts = [f for f in files if f.suffix in (".msgpack", ".ckpt", ".pt")]
        assert ckpts, f"artifact {ref} contains no checkpoint file ({files})"
        # Resume wants the run's LAST state, not the alphabetically-first
        # file (which would always pick best.* over last.*) — prefer an
        # explicit stem priority, falling back to the alias stem if the
        # caller asked for e.g. ':best' (ADVICE r4).
        alias = ref.rsplit(":", 1)[1] if ":" in ref else ""
        priority = ([alias] if alias in ("best", "last") else []) + ["last", "best"]
        for stem in priority:
            named = [f for f in ckpts if f.stem == stem]
            if named:
                ckpts = named
                break
        meta = getattr(art, "metadata", {}) or {}
        if meta:
            LOGGER.info(f"resumed artifact {ref}: epoch {meta.get('epoch')}, fitness {meta.get('fitness')}")
        return str(ckpts[0])

    # -- dataset artifacts (reference: log_dataset_artifact +
    #    create_dataset_table, wandb_utils.py:322-416)

    def log_dataset(self, data_dict: dict, name: str = "dataset", max_table_rows: int = 100) -> None:
        """Upload the dataset splits as a 'dataset' artifact, including a
        browsable Table of (image, ground-truth boxes) rows."""
        if self.run is None:
            return
        names = data_dict.get("names", [])
        art = wandb.Artifact(name, type="dataset",
                             metadata={"nc": data_dict.get("nc"), "names": list(names)})
        table = wandb.Table(columns=["id", "image", "classes"])
        n_rows = 0
        for split in ("train", "val"):
            split_dir = data_dict.get(split)
            if not split_dir or not Path(split_dir).exists():
                continue
            art.add_dir(str(split_dir), name=f"{split}/images")
            lbl_dir = Path(str(split_dir).replace("images", "labels"))
            if lbl_dir.exists() and lbl_dir != Path(split_dir):
                art.add_dir(str(lbl_dir), name=f"{split}/labels")
            for img in sorted(Path(split_dir).glob("*.[jp][pn]g"))[: max(0, max_table_rows - n_rows)]:
                boxes, classes = self._gt_boxes(img, lbl_dir, names)
                table.add_data(
                    img.stem,
                    wandb.Image(str(img), boxes={"ground_truth": {"box_data": boxes}}),
                    json.dumps(classes),
                )
                n_rows += 1
        art.add(table, "table")
        self.run.log_artifact(art)

    @staticmethod
    def _gt_boxes(img_path: Path, lbl_dir: Path, names) -> tuple:
        boxes, classes = [], []
        lbl = lbl_dir / (img_path.stem + ".txt")
        if lbl.exists():
            for line in lbl.read_text().splitlines():
                p = line.split()
                if len(p) < 5:
                    continue
                c, x, y, w, h = int(float(p[0])), *map(float, p[1:5])
                boxes.append({
                    "position": {"middle": [x, y], "width": w, "height": h},
                    "domain": "percentage",
                    "class_id": c,
                    "box_caption": str(names[c]) if c < len(names) else str(c),
                })
                classes.append(c)
        return boxes, classes

    # -- bbox debug panels (reference: val_one_image + log_training_progress,
    #    wandb_utils.py:418-468)

    def log_val_image(self, image, detections, names: Sequence[str], path: str = "",
                      conf_thres: float = 0.25, max_panels: int = 16) -> None:
        """Queue one val image with predicted boxes for the epoch-end media
        panel. detections: (n, 6) [x1 y1 x2 y2 conf cls] pixel coords."""
        if self.run is None or len(self._panel_rows) >= max_panels:
            return
        h, w = image.shape[:2]
        box_data = [
            {
                "position": {"minX": float(d[0]) / w, "minY": float(d[1]) / h,
                             "maxX": float(d[2]) / w, "maxY": float(d[3]) / h},
                "domain": "percentage",
                "class_id": int(d[5]),
                "box_caption": f"{names[int(d[5])] if int(d[5]) < len(names) else d[5]} {d[4]:.2f}",
                "scores": {"conf": float(d[4])},
            }
            for d in detections
            if float(d[4]) >= conf_thres
        ]
        self._panel_rows.append(
            wandb.Image(image, boxes={"predictions": {"box_data": box_data}}, caption=str(path))
        )

    def end_epoch(self, metrics: Optional[Dict[str, float]] = None, step: int = 0) -> None:
        """Flush queued media + scalars (reference: end_epoch,
        wandb_utils.py:481-502)."""
        if self.run is None:
            return
        payload = dict(metrics or {})
        if self._panel_rows:
            payload["val/bounding_boxes"] = self._panel_rows
            self._panel_rows = []
        if payload:
            self.run.log(payload, step=step)

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()
            self.run = None
