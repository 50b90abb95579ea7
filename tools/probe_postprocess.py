"""Split the serving pipeline cost: forward vs decode vs NMS at b32/640.

Run: python tools/probe_postprocess.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(fn, args, iters=20, label=""):
    out = fn(*args)
    jax.tree_util.tree_map(lambda t: t.block_until_ready(), out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        cur = fn(*args)
        if prev is not None:
            float(jnp.sum(jax.tree_util.tree_leaves(prev)[0]))
        prev = cur
    float(jnp.sum(jax.tree_util.tree_leaves(prev)[0]))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:28s} {dt:8.2f} ms/batch")
    return dt


def main():
    from yolosomi_tpu.models.heads import decode
    from yolosomi_tpu.models.yolo import build_model
    from yolosomi_tpu.ops.nms import non_max_suppression
    from yolosomi_tpu.utils.config import find_config, load_model_cfg

    cfg = load_model_cfg(find_config("yolo-somi"))
    model, meta = build_model(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    b, sz = 32, 640
    dummy = jnp.zeros((1, sz, sz, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    images = jnp.asarray(np.random.rand(b, sz, sz, 3).astype(np.float32))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t_f = timed(fwd, (variables, images), label="forward only")

    fwd_dec = jax.jit(lambda v, x: decode(model.apply(v, x, train=False), meta.anchors_px, meta.strides))
    t_fd = timed(fwd_dec, (variables, images), label="forward + decode")

    full = jax.jit(
        lambda v, x: non_max_suppression(
            decode(model.apply(v, x, train=False), meta.anchors_px, meta.strides),
            conf_thres=0.25, iou_thres=0.45, max_det=300,
        )
    )
    t_all = timed(full, (variables, images), label="forward + decode + NMS")

    # NMS alone on realistic decoded output (some boxes above threshold)
    dec = fwd_dec(variables, images)
    dec.block_until_ready()
    nms_only = jax.jit(
        lambda d: non_max_suppression(d, conf_thres=0.25, iou_thres=0.45, max_det=300)
    )
    t_n = timed(nms_only, (dec,), label="NMS alone (on decoded)")

    print(f"\n# decode ≈ {t_fd - t_f:.2f} ms, NMS ≈ {t_all - t_fd:.2f} ms (isolated {t_n:.2f})")
    print(f"# postprocess share of e2e: {(t_all - t_f) / t_all * 100:.1f}%")


if __name__ == "__main__":
    main()
