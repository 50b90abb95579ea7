"""3-group optimizer with YOLOv5 warmup/one-cycle semantics, in optax style.

Reproduces the reference optimizer construction (train.py:125-148) and the
per-iteration warmup (train.py:250-256) as one pure gradient
transformation whose hyperparameters are functions of the step counter —
so the entire schedule lives inside the jitted train step (no Python-side
LR mutation):

- group g0: BatchNorm scales           -> no weight decay
- group g1: conv/dense kernels         -> decoupled weight decay
  (scaled by batch_size * accumulate / 64, train.py:121-123)
- group g2: biases + 1-D fusion params -> no decay, separate warmup start
  (warmup_bias_lr -> lr, while other groups ramp 0 -> lr)
- momentum warms from warmup_momentum to momentum over
  nw = max(warmup_epochs * nb, 1000) iterations (train.py:251)
- epoch LR: one_cycle cosine lr0 -> lr0*lrf (general.py one_cycle) or
  linear (train.py --linear-lr)

The reference's defect of force-enabling Adam at 3e-4 regardless of the
--adam flag (train.py:134-136) is NOT replicated: SGD+nesterov is the
default, --adam opts in.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def param_group(path) -> str:
    """Classify a param path: 'bn' (BatchNorm scale), 'bias', or 'weight'.

    Mirrors the reference's 3-way split (train.py:125-133): BN gammas
    undecayed, biases undecayed with their own warmup, everything else
    decayed. 1-D fusion weights (BiFPN) land in 'bn' (undecayed).
    """
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if leaf == "bias":
        return "bias"
    if leaf == "scale":
        return "bn"
    if leaf in ("weight", "w"):  # BiFPN fusion weights, 1-D
        return "bn"
    return "weight"


class YoloOptState(NamedTuple):
    step: jax.Array  # int32 iteration counter
    momentum_buf: Any  # pytree like params
    adam_mu: Any  # pytree (zeros when SGD)
    adam_nu: Any


def make_optimizer(
    hyp: dict,
    nb: int,  # batches per epoch
    epochs: int,
    batch_size: int,
    accumulate: int = 1,
    adam: bool = False,
    linear_lr: bool = False,
):
    """Returns an optax.GradientTransformation implementing the full
    grouped + scheduled YOLOv5 update."""
    lr0 = float(hyp["lr0"])
    lrf = float(hyp["lrf"])
    momentum = float(hyp["momentum"])
    warmup_momentum = float(hyp["warmup_momentum"])
    warmup_bias_lr = float(hyp["warmup_bias_lr"])
    nbs = 64
    decay = float(hyp["weight_decay"]) * batch_size * accumulate / nbs
    nw = max(round(float(hyp["warmup_epochs"]) * nb), 1000)

    def lf(epoch):
        if linear_lr:
            return (1 - epoch / epochs) * (1.0 - lrf) + lrf
        return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1

    def schedules(step):
        step_f = step.astype(jnp.float32)
        epoch = jnp.floor(step_f / nb)
        base_lr = lr0 * lf(epoch)
        frac = jnp.clip(step_f / nw, 0.0, 1.0)
        in_warmup = step_f < nw
        lr_bias = jnp.where(in_warmup, warmup_bias_lr + frac * (base_lr - warmup_bias_lr), base_lr)
        lr_other = jnp.where(in_warmup, frac * base_lr, base_lr)
        mom = jnp.where(in_warmup, warmup_momentum + frac * (momentum - warmup_momentum), momentum)
        return lr_bias, lr_other, mom

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return YoloOptState(
            step=jnp.zeros((), jnp.int32),
            momentum_buf=zeros,
            adam_mu=jax.tree_util.tree_map(jnp.zeros_like, params) if adam else None,
            adam_nu=jax.tree_util.tree_map(jnp.zeros_like, params) if adam else None,
        )

    def update(grads, state, params):
        lr_bias, lr_other, mom = schedules(state.step)
        groups = jax.tree_util.tree_map_with_path(lambda p, _: param_group(p), params)

        def decayed(g, p, grp):
            return g + decay * p if grp == "weight" else g

        grads = jax.tree_util.tree_map(decayed, grads, params, groups)

        if adam:
            # Adam(betas=(momentum, 0.999)) as the reference configures it
            # (train.py:139); step-dependent bias correction
            t = state.step.astype(jnp.float32) + 1.0
            b1, b2 = momentum, 0.999
            mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.adam_mu, grads)
            nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.adam_nu, grads)

            def adam_update(m, v, grp):
                mhat = m / (1 - b1**t)
                vhat = v / (1 - b2**t)
                lr = lr_bias if grp == "bias" else lr_other
                return -lr * mhat / (jnp.sqrt(vhat) + 1e-8)

            updates = jax.tree_util.tree_map(adam_update, mu, nu, groups)
            new_state = YoloOptState(state.step + 1, state.momentum_buf, mu, nu)
            return updates, new_state

        # SGD + nesterov (torch semantics: buf = mom*buf + g; d = g + mom*buf)
        buf = jax.tree_util.tree_map(lambda b, g: mom * b + g, state.momentum_buf, grads)

        def sgd_update(g, b, grp):
            d = g + mom * b  # nesterov
            lr = lr_bias if grp == "bias" else lr_other
            return -lr * d

        updates = jax.tree_util.tree_map(sgd_update, grads, buf, groups)
        new_state = YoloOptState(state.step + 1, buf, None, None)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def current_lr(hyp: dict, step: int, nb: int, epochs: int, linear_lr: bool = False) -> float:
    """Host-side LR readback for logging."""
    lr0, lrf = float(hyp["lr0"]), float(hyp["lrf"])
    epoch = step // max(nb, 1)
    if linear_lr:
        lf = (1 - epoch / epochs) * (1.0 - lrf) + lrf
    else:
        lf = ((1 - math.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1
    return lr0 * lf
