"""CLI: convert a reference .pt checkpoint to a yolosomi_tpu .msgpack.

Usage:
    python tools/convert_torch.py --pt yolov5s.pt --cfg yolov5s --out yolov5s.msgpack

Torch is required here only (convert time); the produced msgpack loads
without torch. Picks the EMA entry when present, like attempt_load
(reference: experimental.py:97-101). Handles both whole-module pickles
(state_dict extracted) and bare state_dict files.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_torch_state_dict(pt_path: str) -> dict:
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        obj = ckpt.get("ema") or ckpt.get("model") or ckpt
    else:
        obj = ckpt
    if hasattr(obj, "state_dict"):
        sd = obj.float().state_dict()
    elif isinstance(obj, dict):
        sd = obj
    else:
        raise TypeError(f"unsupported checkpoint object {type(obj)}")
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pt", required=True, help="torch checkpoint (.pt)")
    parser.add_argument("--cfg", required=True, help="model yaml name/path")
    parser.add_argument("--nc", type=int, default=None)
    parser.add_argument("--out", default=None, help="output .msgpack path")
    args = parser.parse_args(argv)

    from yolosomi_tpu.engine.checkpoint import save_variables
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import find_config, load_model_cfg
    from yolosomi_tpu.utils.torch_convert import anchors_from_state_dict, convert_state_dict

    sd = load_torch_state_dict(args.pt)
    cfg = load_model_cfg(find_config(args.cfg))
    model, meta = build_model(cfg, nc=args.nc)
    anchors_px = anchors_from_state_dict(sd, meta.strides)
    if anchors_px is not None:
        model, meta = build_model(cfg, nc=args.nc, anchors=anchors_px.reshape(meta.nl, -1).tolist())
    variables = init_model(model, meta)
    variables = convert_state_dict(sd, variables)

    out = args.out or str(Path(args.pt).with_suffix(".msgpack"))
    save_variables(out, variables, meta_dict={"cfg": args.cfg, "nc": meta.nc, "anchors_px": meta.anchors_px.tolist()})
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
