"""Benchmark: flagship YOLO-SOMI inference throughput at 640px.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver. Baseline: 2,000 images/sec/chip (BASELINE.md north star for
TPU v5e). Measures forward + decode + on-device NMS (the full detect.py
inference path, reference: detect.py:148-201) in bf16 at the best batch
size from a small sweep.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 2000.0


def bench(imgsz: int = 640, batches=(16, 32, 64), iters: int = 20) -> float:
    from yolosomi_tpu.models.heads import decode
    from yolosomi_tpu.models.yolo import build_model
    from yolosomi_tpu.ops.nms import non_max_suppression
    from yolosomi_tpu.utils.config import find_config, load_model_cfg

    cfg = load_model_cfg(find_config("yolo-somi"))
    model, meta = build_model(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)

    @jax.jit
    def infer(variables, images):
        preds = model.apply(variables, images, train=False)
        dec = decode(preds, meta.anchors_px, meta.strides)
        return non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45, max_det=300)

    best = 0.0
    for b in batches:
        try:
            images = jnp.asarray(np.random.rand(b, imgsz, imgsz, 3).astype(np.float32))
            out = infer(variables, images)
            jax.block_until_ready(out)  # compile + warmup
            out = infer(variables, images)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = infer(variables, images)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            ips = b * iters / dt
            best = max(best, ips)
        except Exception as e:  # OOM at large batch: keep best so far
            print(f"# batch {b} failed: {e}")
            break
    return best


if __name__ == "__main__":
    ips = bench()
    n_dev = max(jax.device_count(), 1)
    per_chip = ips / n_dev
    print(
        json.dumps(
            {
                "metric": "somi_640px_infer_throughput_per_chip",
                "value": round(per_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_IMG_S, 3),
            }
        )
    )
