"""Fabricate a reference-format .pt checkpoint with random weights.

Powers `tools/reproduce_baseline.sh --synthetic`: the bundle's convert
stage needs a .pt shaped exactly like the reference's checkpoints
(state_dict keyed `model.<i>.<...>` — the layout attempt_load consumes,
reference: experimental.py:97-101) without network egress. The torch
mirror (utils/torch_mirror.py) already builds modules with those keys for
the ONNX/TorchScript export legs; here we save its randomly-initialized
state_dict through torch.save, giving tools/convert_torch.py a real
pickle to exercise.

Usage:
    python tools/make_reference_pt.py --cfg yolov5s --nc 3 --out /tmp/yolov5s.pt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, help="model yaml name/path")
    parser.add_argument("--nc", type=int, default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import torch

    from yolosomi_tpu.models.yolo import build_model
    from yolosomi_tpu.utils.config import find_config, load_model_cfg
    from yolosomi_tpu.utils.torch_mirror import build_torch_mirror

    cfg = load_model_cfg(find_config(args.cfg))
    if args.nc is not None:
        cfg["nc"] = args.nc
    _, meta = build_model(cfg, nc=args.nc)
    torch.manual_seed(args.seed)
    tmodel = build_torch_mirror(cfg, meta, decode=False)
    sd = tmodel.state_dict()
    torch.save({"model": sd}, args.out)
    print(f"wrote {len(sd)} tensors ({args.cfg}, nc={cfg['nc']}) to {args.out}")


if __name__ == "__main__":
    main()
