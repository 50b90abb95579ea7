"""Latency/FPS harness (counterpart of reference utils/get_FPS.py:52-108):
warmup then timed loop at batch 1, reporting ms/img and FPS.

Usage:
    python tools/get_fps.py --cfg yolo-somi --weights somi.msgpack \
        --imgsz 640 --warmup 200 --iters 1000
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="yolo-somi")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--warmup", type=int, default=200)
    parser.add_argument("--iters", type=int, default=1000)
    parser.add_argument("--nms", action="store_true", help="include decode+NMS (default: forward only)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from yolosomi_tpu.engine.runner import Runner

    runner = Runner(args.cfg, args.weights, imgsz=args.imgsz)
    x = jnp.asarray(np.random.rand(args.batch, args.imgsz, args.imgsz, 3).astype(np.float32))

    if args.nms:
        fn = runner.infer_fn(conf_thres=0.25, iou_thres=0.45)
        run = lambda: fn(runner.variables, x)
    else:
        fwd = jax.jit(lambda v, i: runner.model.apply(v, i, train=False))
        run = lambda: fwd(runner.variables, x)

    jax.block_until_ready(run())
    for _ in range(args.warmup):
        out = run()
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ms = dt / args.iters / args.batch * 1000
    print(f"{ms:.3f} ms/img, {1000 / ms:.1f} FPS (batch {args.batch}, imgsz {args.imgsz}, nms={args.nms})")


if __name__ == "__main__":
    main()
