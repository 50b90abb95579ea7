"""Train/eval step factories: jitted, sharded, donated.

TPU-native counterpart of the reference's inner training loop
(train.py:233-283). One compiled function subsumes: AMP autocast
(bf16 compute dtype), loss, backward, DDP all-reduce (XLA inserts it from
the mesh sharding), optimizer step with warmup/one-cycle schedules, and
the EMA update — the reference does each of these as separate Python
steps per iteration.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from yolosomi_tpu.engine.ema import EMAState, ema_init, ema_update
from yolosomi_tpu.parallel.mesh import batch_sharding, replicate


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState
    step: jax.Array
    grad_accum: Any = None  # grad sum buffer when accumulate > 1


def create_train_state(variables, optimizer, accumulate: int = 1) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        ema=ema_init({"params": params, "batch_stats": batch_stats}),
        step=jnp.zeros((), jnp.int32),
        grad_accum=jax.tree_util.tree_map(jnp.zeros_like, params) if accumulate > 1 else None,
    )


def _remat_forward(model, params, batch_stats, images, n_segments: int):
    """Segmented forward with per-segment `jax.checkpoint`: the graph's
    layer list is cut into `n_segments` ranges; only the boundary
    activations (+ crossing skip tensors) are saved for the backward,
    everything inside a segment is recomputed — the standard TPU answer
    to a memory-bound backward (trades ~1 extra forward of FLOPs for
    O(n/segments) activation memory). Returns (head preds, merged
    batch_stats updates)."""
    n = len(model.layers)
    cuts = sorted({int(round(n * k / n_segments)) for k in range(n_segments + 1)} | {0, n})
    run = type(model).run_range

    def make_seg(lo, hi):
        def seg(p, bs, x, saved):
            (out, sv), mut = model.apply(
                {"params": p, "batch_stats": bs}, x, saved, lo, hi, True,
                method=run, mutable=["batch_stats"],
            )
            return out, sv, mut.get("batch_stats", {})

        return jax.checkpoint(seg)

    x, saved = images, {}
    bs_updates = {}
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        x, saved, mut_bs = make_seg(lo, hi)(params, batch_stats, x, saved)
        # flax returns the FULL batch_stats collection (untouched layers at
        # their input values) — keep only this segment's own layers, or the
        # last segment would overwrite every earlier segment's BN updates
        # with the originals it was handed
        seg_keys = {f"layers_{i}" for i in range(lo, hi)}
        bs_updates.update({k: v for k, v in mut_bs.items() if k in seg_keys})
    return x, bs_updates


def make_train_step(
    model,
    loss_fn: Callable,
    optimizer,
    mesh=None,
    scale_to: Optional[int] = None,
    accumulate: int = 1,
    donate: bool = False,
    device_preprocess: Optional[dict] = None,
    freeze: int = 0,
    device_mosaic: Optional[int] = None,
    remat_segments: int = 0,
):
    """Build the jitted train step.

    loss_fn(preds, targets) -> (total, components). images are NHWC float
    (already /255 normalized); targets (B, M, 5) padded.

    `scale_to`: resize images to this square size inside the step — the
    TPU-native multi-scale jitter (reference resizes every batch by a
    random +-50% factor, train.py:257-262; here the trainer pre-builds one
    program per quantized size and picks per batch, labels are
    normalized so they need no adjustment).

    `device_mosaic`: output size of the --cache device path. The step's
    image argument becomes (cache, plan) — the HBM-resident dataset slab
    plus the host randomness plan — and the mosaic/perspective/mixup
    composite runs on device (ops/mosaic_device.py) fused into the step.
    """

    def _build_images(images):
        if device_mosaic is None:
            return images
        from yolosomi_tpu.ops.mosaic_device import mosaic_mixup_batch

        cache, plan = images
        return mosaic_mixup_batch(cache, plan, device_mosaic)

    needs_aux = getattr(loss_fn, "needs_aux", False)

    def train_step(state: TrainState, images, targets, aux=None):
        images = _build_images(images)
        if device_preprocess is not None:
            # fused on-device HSV + flips (+normalize), replacing the host
            # augmentation tail (SURVEY §7.1; building blocks in
            # ops/preprocess.py). Deterministic per step: rng folds the step
            # counter, so resume replays the same jitter stream.
            from yolosomi_tpu.ops.preprocess import preprocess_train_batch

            rng = jax.random.fold_in(
                jax.random.PRNGKey(int(device_preprocess.get("seed", 0))), state.step
            )
            images, targets = preprocess_train_batch(images, targets, rng, device_preprocess)
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        if scale_to is not None and scale_to != images.shape[1]:
            b, _, _, c = images.shape
            images = jax.image.resize(images, (b, scale_to, scale_to, c), method="bilinear")

        def loss_of(params):
            feats = None
            needs_feats = getattr(loss_fn, "needs_features", False)
            if remat_segments > 0:
                assert not needs_feats, "--distill-hint is incompatible with --remat"
                preds, bs_updates = _remat_forward(
                    model, params, state.batch_stats, images, remat_segments
                )
                mutated = {"batch_stats": {**state.batch_stats, **bs_updates}}
            elif needs_feats:
                # hint distillation: the forward additionally surfaces the
                # head-input feature maps (engine/distill.py hint_loss)
                (preds, feats), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    train=True,
                    mutable=["batch_stats"],
                    features=True,
                )
            else:
                preds, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    train=True,
                    mutable=["batch_stats"],
                )
            if getattr(loss_fn, "needs_images", False):
                # distillation wrapper: the frozen teacher's forward runs
                # here, inside the same compiled step (engine/distill.py);
                # the teacher tree arrives as the aux ARGUMENT, never as a
                # closure constant (remote-compile literal-size limits)
                kw = {"feats": feats, "params": params} if needs_feats else {}
                loss, comps = loss_fn(preds, targets, images=images, aux=aux, **kw)
            else:
                loss, comps = loss_fn(preds, targets)
            return loss, (comps, mutated["batch_stats"])

        (loss, (comps, new_bs)), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)

        if freeze > 0:
            # transfer-learning freeze (reference train.py --freeze:
            # requires_grad=False on model.{0..N-1}): zero the gradients of
            # the first `freeze` graph layers so the optimizer never moves
            # them (weight decay is also multiplicative on grads here)
            frozen = {f"layers_{i}" for i in range(freeze)}

            def _mask_frozen(tree):
                return {
                    k: (jax.tree_util.tree_map(jnp.zeros_like, v) if k in frozen else v)
                    for k, v in tree.items()
                }

            grads = _mask_frozen(grads)

        # GradScaler-equivalent step skipping (reference: torch.cuda.amp
        # scaler.step skips on inf/nan grads, train.py:271-277): a
        # non-finite batch must never reach the parameters. Also guards
        # against transient backend glitches corrupting the run.
        grads_finite = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g.astype(jnp.float32))) for g in jax.tree_util.tree_leaves(grads)])
        )
        grads = jax.tree_util.tree_map(lambda g: jnp.where(grads_finite, g, jnp.zeros_like(g)), grads)
        new_bs = jax.tree_util.tree_map(
            lambda new, old: jnp.where(grads_finite, new, old), new_bs, state.batch_stats
        )

        if accumulate > 1:
            # accumulate gradient sums and step every `accumulate` calls
            # (reference: train.py:271-277 — step + EMA update on boundary)
            acc = jax.tree_util.tree_map(lambda a, g: a + g, state.grad_accum, grads)
            boundary = (state.step + 1) % accumulate == 0

            def apply_branch(op):
                params, opt_state, acc_in, ema = op
                updates, new_opt = optimizer.update(acc_in, opt_state, params)
                if freeze > 0:
                    updates = _mask_frozen(updates)
                new_params = optax.apply_updates(params, updates)
                new_ema = ema_update(ema, {"params": new_params, "batch_stats": new_bs})
                return new_params, new_opt, jax.tree_util.tree_map(jnp.zeros_like, acc_in), new_ema

            def skip_branch(op):
                params, opt_state, acc_in, ema = op
                # keep EMA tree structure identical across branches
                return params, opt_state, acc_in, EMAState(ema.variables, ema.updates)

            new_params, new_opt, new_acc, new_ema = jax.lax.cond(
                boundary, apply_branch, skip_branch, (state.params, state.opt_state, acc, state.ema)
            )
            new_state = TrainState(new_params, new_bs, new_opt, new_ema, state.step + 1, new_acc)
        else:

            def apply_branch(op):
                params, opt_state, ema = op
                updates, new_opt = optimizer.update(grads, opt_state, params)
                if freeze > 0:
                    updates = _mask_frozen(updates)
                new_params = optax.apply_updates(params, updates)
                new_ema = ema_update(ema, {"params": new_params, "batch_stats": new_bs})
                return new_params, new_opt, new_ema

            def skip_branch(op):
                params, opt_state, ema = op
                return params, opt_state, EMAState(ema.variables, ema.updates)

            new_params, new_opt, new_ema = jax.lax.cond(
                grads_finite, apply_branch, skip_branch, (state.params, state.opt_state, state.ema)
            )
            new_state = TrainState(new_params, new_bs, new_opt, new_ema, state.step + 1, state.grad_accum)
        metrics = {
            "loss": loss,
            "lbox": comps[0],
            "lobj": comps[1],
            "lcls": comps[2],
            "grads_finite": grads_finite,
        }
        return new_state, metrics

    # donation is OFF by default: on the remote-TPU tunnel runtime,
    # interleaving other executables (per-epoch val) with a donated train
    # step corrupts the live state (reproducible NaNs right after val;
    # clean with --noval or donate=False). Enable on trusted runtimes for
    # the in-place update memory savings.
    donate_argnums = (0,) if donate else ()
    if not needs_aux:
        # keep the 3-arg signature for every non-distillation caller
        base_step = train_step

        def train_step(state, images, targets):  # noqa: F811
            return base_step(state, images, targets)
    if mesh is not None:
        if device_mosaic is not None:
            # (cache replicated, plan batch-sharded per leaf)
            images_sharding = (
                replicate(mesh),
                {
                    "idx": batch_sharding(mesh, 3), "center": batch_sharding(mesh, 3),
                    "offs": batch_sharding(mesh, 4), "srect": batch_sharding(mesh, 4),
                    "minv": batch_sharding(mesh, 4), "mixw": batch_sharding(mesh, 1),
                },
            )
        else:
            images_sharding = batch_sharding(mesh, 4)
        in_shardings = (
            replicate(mesh),  # state
            images_sharding,
            batch_sharding(mesh, 3),  # targets
        )
        if needs_aux:
            in_shardings = in_shardings + (replicate(mesh),)  # teacher tree
        return jax.jit(
            train_step, in_shardings=in_shardings, out_shardings=(replicate(mesh), replicate(mesh)),
            donate_argnums=donate_argnums,
        )
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(model, meta, conf_thres=0.001, iou_thres=0.6, max_det=300, multi_label=True, mesh=None):
    """Build a jitted inference step: forward + decode + NMS on device
    (replaces detect.py:148-201 per-image host loop)."""
    from yolosomi_tpu.models.heads import decode
    from yolosomi_tpu.ops.nms import non_max_suppression

    def eval_step(variables, images):
        preds = model.apply(variables, images, train=False)
        dec = decode(preds, meta.anchors_px, meta.strides)
        return non_max_suppression(
            dec, conf_thres=conf_thres, iou_thres=iou_thres, multi_label=multi_label, max_det=max_det
        )

    if mesh is not None:
        return jax.jit(
            eval_step,
            in_shardings=(replicate(mesh), batch_sharding(mesh, 4)),
            out_shardings=batch_sharding(mesh, 3),
        )
    return jax.jit(eval_step)


def ema_variables(state: TrainState):
    """EMA weights for eval/checkpointing (reference validates with
    ema.ema, train.py:297)."""
    return {"params": state.ema.variables["params"], "batch_stats": state.ema.variables["batch_stats"]}


def model_variables(state: TrainState):
    return {"params": state.params, "batch_stats": state.batch_stats}
