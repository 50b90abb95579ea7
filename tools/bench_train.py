"""Training-step throughput of the flagship on the real TPU.

Complements bench.py (inference) with the train-side number: jitted
fwd+bwd+opt update at 640px, bf16 params, synthetic batch. Chained
timing per PERF.md methodology (tunnel RTT amortized).

Run: python tools/bench_train.py [--batch 16]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="yolo-somi")
    ap.add_argument("--donate", action="store_true",
                    help="donate the train state (in-place update; halves the "
                         "params+momentum HBM round trip). Safe in isolation; the "
                         "production loop keeps donate=False on the tunnel runtime "
                         "(interleaved-val corruption, see trainer.py)")
    ap.add_argument("--remat", type=int, default=0,
                    help="jax.checkpoint segments (trainer._remat_forward); trades "
                         "~1 extra forward for O(n/segments) activation memory — "
                         "the standard TPU answer to a memory-bound backward")
    args = ap.parse_args()

    from yolosomi_tpu.engine.optim import make_optimizer
    from yolosomi_tpu.engine.trainer import create_train_state, make_train_step
    from yolosomi_tpu.losses import ComputeLoss
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import find_config, load_hyp, load_model_cfg

    hyp = load_hyp(None)
    cfg = load_model_cfg(find_config(args.cfg))
    # bf16 compute like train.py's default
    model, meta = build_model(cfg, nc=10, dtype=jnp.bfloat16)
    variables = init_model(model, meta, imgsz=256)
    loss_fn = ComputeLoss(meta, hyp)
    optimizer = make_optimizer(hyp, nb=100, epochs=100, batch_size=args.batch)
    state = create_train_state(dict(variables), optimizer)
    step = make_train_step(model, loss_fn, optimizer, donate=args.donate,
                           remat_segments=args.remat)

    b, sz = args.batch, args.imgsz
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, sz, sz, 3)), jnp.float32)
    targets = np.zeros((b, 32, 5), np.float32)
    targets[:, :, 0] = -1  # pad convention: cls = -1 (losses.py pad_targets)
    targets[:, :4, 0] = rng.integers(0, 10, (b, 4))
    targets[:, :4, 1:] = rng.uniform(0.2, 0.6, (b, 4, 4))
    targets = jnp.asarray(targets)

    state, metrics = step(state, images, targets)
    print(f"# warm metrics {jax.tree_util.tree_map(float, metrics)}")

    iters = 12
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        state, metrics = step(state, images, targets)
        if prev is not None:
            float(jax.tree_util.tree_leaves(prev)[0])  # overlap fetch
        prev = metrics
    float(jax.tree_util.tree_leaves(prev)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step b{b} {sz}px remat={args.remat}: {dt * 1000:.1f} ms/step -> {b / dt:.1f} img/s")


if __name__ == "__main__":
    main()
