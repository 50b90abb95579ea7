"""Config planes: hyperparameter YAML, data YAML, model YAML.

The reference uses three config planes (SURVEY.md §5.6): argparse flags,
hyp YAML (29+ keys incl. SOMI extras), and model/data YAMLs. This module
keeps the YAML schemas byte-compatible so reference configs parse
unchanged (reference: train.py:354-400, data/hyps/hyp.VisDrone.yaml).
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml

# Full default hyp set: union of data/hyps/hyp.scratch.yaml and the SOMI
# extras in hyp.VisDrone.yaml:31-39. Missing keys in user YAMLs fall back to
# these, fixing the reference's KeyError with hyp.UAVDT.yaml
# (reference defect: utils/loss.py:129,162-163 reads keys unconditionally).
DEFAULT_HYP = {
    "lr0": 0.01,
    "lrf": 0.1,
    "momentum": 0.937,
    "weight_decay": 0.0005,
    "warmup_epochs": 3.0,
    "warmup_momentum": 0.8,
    "warmup_bias_lr": 0.1,
    "box": 0.05,
    "cls": 0.5,
    "cls_pw": 1.0,
    "obj": 1.0,
    "obj_pw": 1.0,
    "iou_t": 0.2,
    "anchor_t": 4.0,
    "fl_gamma": 0.0,
    "hsv_h": 0.015,
    "hsv_s": 0.7,
    "hsv_v": 0.4,
    "degrees": 0.0,
    "translate": 0.1,
    "scale": 0.5,
    "shear": 0.0,
    "perspective": 0.0,
    "flipud": 0.0,
    "fliplr": 0.5,
    "mosaic": 1.0,
    "mixup": 0.0,
    "copy_paste": 0.0,
    "label_smoothing": 0.0,
    # SOMI extras (hyp.VisDrone.yaml:31-39)
    "alpha": 0.01,  # repulsion loss RepGT weight
    "beta": 0.1,  # repulsion loss RepBox weight
    "Rp_nms": 0.1,  # repulsion NMS sigma
    "deta": 0.5,  # repulsion smooth_ln switch point
    "slide_ratio": 0,  # SlideLoss enable (>0)
    "nwdloss": 0,  # NWD box-loss blending enable (>0)
    "shapeloss": 0,  # use shape-weighted NWD variant (>0)
}


def load_hyp(path=None, overrides: dict | None = None) -> dict:
    """Load a hyp YAML merged over DEFAULT_HYP."""
    hyp = dict(DEFAULT_HYP)
    if path:
        with open(path, errors="ignore") as f:
            user = yaml.safe_load(f) or {}
        hyp.update(user)
    if overrides:
        hyp.update(overrides)
    return hyp


def load_data_cfg(path) -> dict:
    """Load a dataset YAML (path/train/val/test/nc/names schema, reference:
    data/VisDrone.yaml) and resolve relative paths against its `path` key."""
    path = Path(path)
    with open(path, errors="ignore") as f:
        data = yaml.safe_load(f)
    if "names" in data and isinstance(data["names"], dict):
        data["names"] = [data["names"][i] for i in sorted(data["names"])]
    if "nc" not in data and "names" in data:
        data["nc"] = len(data["names"])
    root = Path(data.get("path", path.parent))
    if not root.is_absolute():
        root = (path.parent / root).resolve()
    for k in ("train", "val", "test"):
        if data.get(k) and isinstance(data[k], str) and not os.path.isabs(data[k]):
            data[k] = str(root / data[k])
        elif data.get(k) and isinstance(data[k], list):
            data[k] = [str(root / x) if not os.path.isabs(x) else x for x in data[k]]
    data["path"] = str(root)
    return data


def load_model_cfg(path) -> dict:
    """Load a model-graph YAML (`nc`, `depth_multiple`, `width_multiple`,
    `anchors`, `backbone`, `head` rows — reference: models/yolo.py:1164)."""
    with open(path, errors="ignore") as f:
        cfg = yaml.safe_load(f)
    for key in ("backbone", "head"):
        if key not in cfg:
            raise ValueError(f"model yaml {path} missing '{key}' section")
    cfg.setdefault("depth_multiple", 1.0)
    cfg.setdefault("width_multiple", 1.0)
    cfg.setdefault("ch", 3)
    return cfg


def save_yaml(path, data: dict) -> None:
    with open(path, "w") as f:
        yaml.safe_dump({k: (v if not isinstance(v, Path) else str(v)) for k, v in data.items()}, f, sort_keys=False)


CONFIG_ROOT = Path(__file__).resolve().parents[2] / "configs"


def find_config(name: str, kind: str = "models") -> Path:
    """Resolve a config by name: absolute path, cwd-relative, or bundled
    under configs/{models,hyps,data}/."""
    p = Path(name)
    if p.exists():
        return p
    for base in (CONFIG_ROOT / kind, CONFIG_ROOT / kind / "hub"):
        for cand in (base / name, base / f"{name}.yaml"):
            if cand.exists():
                return cand
    raise FileNotFoundError(f"config '{name}' not found (searched cwd and {CONFIG_ROOT / kind})")


def check_dataset(data: dict) -> dict:
    """Validate dataset paths exist; this zero-egress build points at the
    converters instead of downloading (reference check_dataset,
    general.py:359 runs the YAML's download script)."""
    from yolosomi_tpu.utils.general import LOGGER

    missing = [k for k in ("train", "val") if data.get(k) and not Path(str(data[k]).split("*")[0]).exists()]
    if missing:
        raise FileNotFoundError(
            f"dataset paths missing: {[data[k] for k in missing]}. This build has no "
            "network egress — place the data manually and convert labels with "
            "tools/visdrone2yolo.py (VisDrone) or tools/voc2coco.py."
        )
    LOGGER.info(f"dataset ok: train={data.get('train')} val={data.get('val')}")
    return data
