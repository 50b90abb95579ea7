"""Per-segment profile of the training step on the real TPU (PERF.md
round-3 item: training has had no optimization pass; 73 img/s vs 296
forward-only).

Times, each as its own chained jit (dtype-correct perturbation):
  fwd_eval   : forward, train=False (inference program, reference point)
  fwd_train  : forward, train=True + BN stat mutation
  fwd_loss   : + ComputeLoss (build_targets, CIoU, BCE)
  grad       : value_and_grad of (forward+loss) w.r.t. params
  full_step  : the real make_train_step program (guard + opt + EMA)
  full_donate: same with donate_argnums (in-place state update)

Run: python tools/profile_train_segments.py [--batch 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(run, args, reps=3, iters=4):
    out = run(*args)
    jax.tree_util.tree_map(
        lambda l: float(jnp.sum(l).astype(jnp.float32)) if hasattr(l, "dtype") else l,
        out,
        is_leaf=lambda l: hasattr(l, "dtype"),
    )
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = run(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="yolo-somi")
    args = ap.parse_args()

    from yolosomi_tpu.engine.optim import make_optimizer
    from yolosomi_tpu.engine.trainer import create_train_state, make_train_step
    from yolosomi_tpu.losses import ComputeLoss
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import find_config, load_hyp, load_model_cfg

    hyp = load_hyp(None)
    cfg = load_model_cfg(find_config(args.cfg))
    model, meta = build_model(cfg, nc=10, dtype=jnp.bfloat16)
    variables = init_model(model, meta, imgsz=256)
    loss_fn = ComputeLoss(meta, hyp)

    b, sz = args.batch, args.imgsz
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, sz, sz, 3)), jnp.float32)
    t = np.full((b, 32, 5), -1, np.float32)
    t[:, :4, 0] = rng.integers(0, 10, (b, 4))
    t[:, :4, 1:] = rng.uniform(0.2, 0.6, (b, 4, 4))
    targets = jnp.asarray(t)

    params, bs = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd_eval(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x, train=False)

    @jax.jit
    def fwd_train(p, s, x):
        return model.apply({"params": p, "batch_stats": s}, x, train=True, mutable=["batch_stats"])

    @jax.jit
    def fwd_loss(p, s, x, tt):
        preds, mut = model.apply({"params": p, "batch_stats": s}, x, train=True, mutable=["batch_stats"])
        loss, comps = loss_fn(preds, tt)
        return loss

    @jax.jit
    def grad(p, s, x, tt):
        def f(pp):
            preds, mut = model.apply(
                {"params": pp, "batch_stats": s}, x, train=True, mutable=["batch_stats"]
            )
            loss, comps = loss_fn(preds, tt)
            return loss

        return jax.value_and_grad(f)(p)

    print(f"# flagship train segments, b{b} {sz}px bf16")
    ms = timed(fwd_eval, (params, bs, images))
    print(f"fwd_eval    {ms:8.1f} ms  ({b / ms * 1000:6.1f} img/s)")
    ms = timed(fwd_train, (params, bs, images))
    print(f"fwd_train   {ms:8.1f} ms  ({b / ms * 1000:6.1f} img/s)")
    ms = timed(fwd_loss, (params, bs, images, targets))
    print(f"fwd_loss    {ms:8.1f} ms  ({b / ms * 1000:6.1f} img/s)")
    ms = timed(grad, (params, bs, images, targets))
    print(f"grad        {ms:8.1f} ms  ({b / ms * 1000:6.1f} img/s)")

    for donate in (False, True):
        optimizer = make_optimizer(hyp, nb=100, epochs=100, batch_size=b)
        state = create_train_state(
            {"params": jax.tree_util.tree_map(jnp.array, params),
             "batch_stats": jax.tree_util.tree_map(jnp.array, bs)},
            optimizer,
        )
        step = make_train_step(model, loss_fn, optimizer, donate=donate)

        def run_step(s):
            ns, m = step(s, images, targets)
            return ns, m

        # manual timing: state is threaded (and consumed when donated)
        ns, m = run_step(state)
        float(m["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                ns, m = run_step(ns)
            float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / 4)
        ms = best * 1000
        label = "full_donate" if donate else "full_step  "
        print(f"{label} {ms:8.1f} ms  ({b / ms * 1000:6.1f} img/s)")


if __name__ == "__main__":
    main()
