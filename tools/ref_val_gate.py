"""Cross-framework mAP gate: run the REFERENCE's own val.py on our
trained weights, in this environment, and compare against our val.py.

This executes the BASELINE.md "mAP within 0.1 of the PyTorch reference"
gate end-to-end for the first time: same images (shapes1200 val), same
weights (converted through the torch key-map), the reference's complete
dataloader -> Model forward -> non_max_suppression -> ap_per_class
pipeline (reference: val.py:72-301) on CPU vs ours.

How the reference side becomes runnable on this image:
  - dependency stubs: the same installer the oracle suite uses
    (tests/test_reference_oracle.py) — torchvision/ultralytics/timm/
    monai/mmcv placeholders + tiny public-formula functions;
  - torchvision.ops.nms (utils/general.py:694, the ONE native op its
    eval path needs): replaced with the pure-torch greedy shim
    ops/torch_nms.py, itself pinned against the sequential-greedy oracle
    (tests/test_torch_nms.py);
  - the reference cannot build its own flagship as shipped (three latent
    defects — C2fEACBAM naming, missing parse_model rewrite rules /
    Segment name, EMACBAM conv_spatial shape crash); patched exactly as
    the full-flagship oracle fixture does, at full width here;
  - weights: our checkpoint's variable tree mapped onto the reference
    Model's state_dict via utils/onnx_export.state_dict_from_variables
    (the inverse of the strict-tested torch->flax converter), then
    pickled as a reference-format .pt consumed by the reference's own
    attempt_load (experimental.py:90-115), including its fuse() path.

Usage:
    python tools/ref_val_gate.py \
        --ckpt runs/train/flagship1200/weights/best.msgpack \
        --cfg yolo-somi --data datasets/shapes1200/shapes.yaml \
        --out runs/refgate
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
REF_ROOT = "/root/reference"


from yolosomi_tpu.utils.torch_mirror import TEMACBAMBottleneck  # noqa: E402


class RepairedEMACBAM(TEMACBAMBottleneck):
    """Repaired EMACBAM in torch form, module-level so the reference-format
    .pt pickles/unpickles (same interpretation as the oracle fixture)."""

    def __init__(self, c1, c2, shortcut=True, g=1, e=0.5, k=(3, 3),
                 ratio=16, kernel_size=7, factor=8):
        super().__init__(c2, e=e, factor=factor)


def _build_reference_model(cfg: dict, nc: int):
    """Reference Model(yaml) at the given scale, with the three shipped
    defects patched exactly as tests/test_reference_oracle.py's
    flagship_oracle_pair documents (verified there at width 0.25)."""
    import copy
    import tempfile

    import yaml as _yaml

    import models.common as ref_common
    import models.yolo as ref_yolo

    refcfg = copy.deepcopy(cfg)
    for section in ("backbone", "head"):
        for row in refcfg[section]:
            if row[2] == "C2fEMACBAM":
                row[2] = "C2f"

    saved = {
        "C2f": getattr(ref_yolo, "C2f", None),
        "Segment": getattr(ref_yolo, "Segment", None),
        "EMACBAM": ref_common.EMACBAMBottleneck,
    }
    ref_yolo.C2f = ref_common.C2fEMACBAM
    ref_yolo.Segment = type("Segment", (), {})
    ref_common.EMACBAMBottleneck = RepairedEMACBAM
    ref_yolo.EMACBAMBottleneck = RepairedEMACBAM
    try:
        with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
            _yaml.safe_dump(refcfg, f)
            ref_yaml = f.name
        model = ref_yolo.Model(ref_yaml, ch=3, nc=nc)
    finally:
        for name, val in (("C2f", saved["C2f"]), ("Segment", saved["Segment"])):
            if val is None:
                delattr(ref_yolo, name)
            else:
                setattr(ref_yolo, name, val)
        ref_common.EMACBAMBottleneck = saved["EMACBAM"]
        ref_yolo.EMACBAMBottleneck = saved["EMACBAM"]
    return model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/train/flagship1200/weights/best.msgpack")
    ap.add_argument("--cfg", default="yolo-somi")
    ap.add_argument("--data", default="datasets/shapes1200/shapes.yaml")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--conf-thres", type=float, default=0.001)
    ap.add_argument("--iou-thres", type=float, default=0.6)
    ap.add_argument("--out", default="runs/refgate")
    ap.add_argument("--tag", default="flagship", help="row label in GATE.json")
    ap.add_argument("--skip-ours", action="store_true",
                    help="only run the reference leg (ours read from --ours-metrics)")
    ap.add_argument("--ours-metrics", default=None,
                    help="existing metrics.json to use for the OUR row")
    args = ap.parse_args(argv)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # ---- environment: stubs + reference modules (the oracle suite's own
    # installer — importing the module performs the install and the
    # reference imports, then removes REF_ROOT from sys.path again)
    import tests.test_reference_oracle  # noqa: F401

    import torch

    # real NMS instead of the oracle suite's inert placeholder
    import torchvision
    from yolosomi_tpu.ops.torch_nms import nms as torch_nms

    # max_keep=300 == the reference's max_det truncation (general.py:696):
    # exact early stop that keeps the python greedy loop inside the
    # reference's own 10 s NMS time limit (general.py:702)
    torchvision.ops.nms = lambda b, s, thr: torch_nms(b, s, thr, max_keep=300)

    # the reference's fuse() calls m.forward_fuse on its Conv class, which
    # resolves to the oracle _UConv stub (common.py:9163 rebind) — give it
    # the standard fused forward (conv -> act, bn folded away)
    from tests.test_reference_oracle import _UConv

    if not hasattr(_UConv, "forward_fuse"):
        _UConv.forward_fuse = lambda self, x: self.act(self.conv(x))

    # ---- our trained weights + run metadata
    import copy

    import numpy as np

    from yolosomi_tpu.engine.checkpoint import load_artifact
    from yolosomi_tpu.utils.config import find_config, load_data_cfg, load_model_cfg
    from yolosomi_tpu.utils.onnx_export import state_dict_from_variables

    variables, anchors = load_artifact(args.ckpt)
    data_dict = load_data_cfg(find_config(args.data, "data"))
    nc = int(data_dict["nc"])
    names = list(data_dict["names"])

    cfg = copy.deepcopy(load_model_cfg(find_config(args.cfg)))
    cfg["nc"] = nc
    if anchors is not None:
        # the run's (autoanchor-refined) anchors ride the artifact; the
        # reference persists the same thing inside its pickled model
        cfg["anchors"] = [list(map(float, a.reshape(-1))) for a in np.asarray(anchors)]

    print(f"[gate] building reference Model ({args.cfg}, nc={nc}) ...", flush=True)
    t0 = time.time()
    ref_model = _build_reference_model(cfg, nc)
    print(f"[gate] reference Model built in {time.time()-t0:.1f}s", flush=True)

    sd, missing = state_dict_from_variables(variables, ref_model)
    n_loaded = sum(1 for k in sd if k not in missing)
    bad = [k for k in missing
           if ".conv.reduction." not in k and "num_batches_tracked" not in k
           and "anchor" not in k and "grid" not in k and "implicit" not in k]
    print(f"[gate] state_dict: {n_loaded}/{len(sd)} tensors from ours; "
          f"unmatched={len(missing)} (dead/buffers), unexpected={bad[:8]}", flush=True)
    assert not bad, f"unexpected unmatched reference keys: {bad[:20]}"
    ref_model.load_state_dict(sd)
    ref_model.names = names
    ref_model.eval().float()

    pt_path = out / f"{args.tag}_ref.pt"
    torch.save({"model": ref_model}, pt_path)
    print(f"[gate] wrote reference-format checkpoint {pt_path}", flush=True)

    # torch-era shim: the reference predates torch 2.6's weights_only=True
    # default, and its attempt_load (experimental.py:96) pickles the full
    # Model object — restore the pre-2.6 default for this trusted,
    # just-written-by-us file
    _orig_load = torch.load

    def _load_compat(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load_compat

    # ---- the reference's own val.py, loaded by path (its module name
    # `val` collides with ours)
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_val", f"{REF_ROOT}/val.py")
    ref_val = importlib.util.module_from_spec(spec)
    sys.modules["ref_val"] = ref_val
    spec.loader.exec_module(ref_val)

    data_yaml = str(Path(find_config(args.data, "data")).resolve())
    print(f"[gate] running REFERENCE val.py on {data_yaml} ...", flush=True)
    t0 = time.time()
    (mp, mr, map50, mAP, *_), _, _ = ref_val.run(
        data=data_yaml, weights=str(pt_path), batch_size=args.batch,
        imgsz=args.imgsz, conf_thres=args.conf_thres, iou_thres=args.iou_thres,
        task="val", device="cpu", half=False, plots=False, save_json=False,
        project=str(out), name=f"{args.tag}-ref", exist_ok=True,
    )
    ref_row = {"P": float(mp), "R": float(mr), "mAP50": float(map50),
               "mAP": float(mAP), "seconds": round(time.time() - t0, 1)}
    print(f"[gate] reference leg: {ref_row}", flush=True)

    # ---- our val.py, same weights / protocol / device (f32 on CPU so the
    # comparison isolates framework semantics, not dtype)
    if args.skip_ours and args.ours_metrics:
        ours_row = json.loads(Path(args.ours_metrics).read_text())
        ours_row = {"P": ours_row["P"], "R": ours_row["R"],
                    "mAP50": ours_row["mAP50"], "mAP": ours_row["mAP"],
                    "seconds": None, "source": args.ours_metrics}
    else:
        import jax.numpy as jnp

        import val as our_val
        from yolosomi_tpu.engine.runner import Runner

        print("[gate] running OUR val.py (f32, cpu) ...", flush=True)
        t0 = time.time()
        runner = Runner(args.cfg, args.ckpt, nc=nc, dtype=jnp.float32, imgsz=args.imgsz)
        results, _, _ = our_val.run(
            data=data_yaml, runner=runner, batch_size=args.batch, imgsz=args.imgsz,
            conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            project=str(out), name=f"{args.tag}-ours", exist_ok=True, names=names,
        )
        ours_row = {"P": float(results[0]), "R": float(results[1]),
                    "mAP50": float(results[2]), "mAP": float(results[3]),
                    "seconds": round(time.time() - t0, 1)}
    print(f"[gate] our leg: {ours_row}", flush=True)

    delta50 = abs(ref_row["mAP50"] - ours_row["mAP50"])
    gate = {
        "tag": args.tag, "ckpt": args.ckpt, "cfg": args.cfg, "data": data_yaml,
        "imgsz": args.imgsz, "conf_thres": args.conf_thres, "iou_thres": args.iou_thres,
        "reference": ref_row, "ours": ours_row,
        "delta_mAP50": round(delta50, 5),
        "delta_mAP": round(abs(ref_row["mAP"] - ours_row["mAP"]), 5),
        "gate_0.1": bool(delta50 <= 0.1),
    }
    gate_file = out / "GATE.json"
    existing = json.loads(gate_file.read_text()) if gate_file.exists() else []
    existing = [g for g in existing if g.get("tag") != args.tag] + [gate]
    gate_file.write_text(json.dumps(existing, indent=2))
    print(f"[gate] {json.dumps(gate)}", flush=True)
    print(f"[gate] |d mAP50| = {delta50:.5f} -> gate<=0.1: {'PASS' if gate['gate_0.1'] else 'FAIL'}")
    return gate


if __name__ == "__main__":
    main()
