"""Reproduce / localize non-finite gradients in the flagship train step.

Usage: python tools/probe_nan_grads.py [--imgsz 128] [--width 1.0]
       [--dtype bf16|f32] [--steps 3] [--data datasets/shapes/shapes.yaml]

Loads a real batch through the host pipeline, runs fwd+bwd, and reports
which gradient leaves are non-finite (sorted by tree path).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", type=int, default=128)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--depth", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--data", default="datasets/shapes/shapes.yaml")
    ap.add_argument("--hyp", default="hyp.visdrone")
    ap.add_argument("--weights", default="")
    args = ap.parse_args()

    from yolosomi_tpu.data.datasets import DataLoader, DetectionDataset
    from yolosomi_tpu.losses import ComputeLoss
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import find_config, load_data_cfg, load_hyp, load_model_cfg

    hyp = load_hyp(find_config(args.hyp, "hyps"))
    data = load_data_cfg(find_config(args.data, "data"))
    cfg = load_model_cfg(find_config("yolo-somi"))
    cfg["width_multiple"] = args.width
    cfg["depth_multiple"] = args.depth
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, meta = build_model(cfg, nc=int(data["nc"]), dtype=dtype)
    variables = init_model(model, meta, imgsz=min(args.imgsz, 256))
    if args.weights:
        from yolosomi_tpu.engine.checkpoint import checkpoint_variables, load_checkpoint

        variables = checkpoint_variables(load_checkpoint(args.weights))
        print(f"loaded weights from {args.weights}")
    loss_fn = ComputeLoss(meta, hyp)

    ds = DetectionDataset(
        data["train"], img_size=args.imgsz, batch_size=args.batch, augment=True,
        hyp=dict(hyp), rect=False, stride=int(max(meta.strides)), max_labels=300,
    )
    dl = DataLoader(ds, args.batch, shuffle=True, prefetch=0, seed=0)

    @jax.jit
    def grad_step(variables, images, targets):
        def loss_of(params):
            preds, _ = model.apply(
                {"params": params, "batch_stats": variables.get("batch_stats", {})},
                images, train=True, mutable=["batch_stats"],
            )
            loss, comps = loss_fn(preds, targets)
            return loss, comps

        (loss, comps), grads = jax.value_and_grad(loss_of, has_aux=True)(variables["params"])
        return loss, comps, grads

    it = iter(dl)
    for step in range(args.steps):
        images, targets, _, _ = next(it)
        x = jnp.asarray(images).astype(jnp.float32) / 255.0
        loss, comps, grads = grad_step(variables, x, jnp.asarray(targets))
        bad = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            a = np.asarray(leaf, np.float32)
            if not np.isfinite(a).all():
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                bad.append((name, int((~np.isfinite(a)).sum()), a.size))
        print(
            f"step {step}: loss={float(loss):.4f} comps={[round(float(c), 4) for c in comps]} "
            f"bad_grad_leaves={len(bad)}"
        )
        for name, nbad, size in bad[:15]:
            print(f"  NONFINITE {name}: {nbad}/{size}")


if __name__ == "__main__":
    main()
