"""Training CLI (counterpart of reference train.py).

Full loop: checkpoint restore/transfer, 3-group optimizer with one-cycle
LR + warmup (inside the jitted step), EMA, data-parallel sharding over a
jax Mesh (replacing DDP/NCCL, reference train.py:422-429), per-epoch
validation with EMA weights, best/last checkpointing, early stopping.

Reference defects NOT reproduced (SURVEY.md §0): CUDA_VISIBLE_DEVICES
pinning (train.py:55), forced Adam (train.py:134-136), wandb force-off
(train.py:80). The dead RepulsionLoss wiring is live here via --rep.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

import val as validate
from yolosomi_tpu.data.datasets import DataLoader, DetectionDataset
from yolosomi_tpu.engine.checkpoint import (
    AsyncCheckpointer,
    checkpoint_variables,
    load_checkpoint,
    save_checkpoint,
    strip_checkpoint,
)
from yolosomi_tpu.engine.ema import EarlyStopping
from yolosomi_tpu.engine.optim import make_optimizer
from yolosomi_tpu.engine.runner import Runner
from yolosomi_tpu.engine.trainer import (
    create_train_state,
    ema_variables,
    make_train_step,
)
from yolosomi_tpu.losses import ComputeLoss
from yolosomi_tpu.models.yolo import build_model, init_model
from yolosomi_tpu.parallel.mesh import create_mesh, replicate_tree, shard_batch
from yolosomi_tpu.utils.config import (
    find_config,
    load_data_cfg,
    load_hyp,
    load_model_cfg,
    save_yaml,
)
from yolosomi_tpu.utils.general import LOGGER, check_img_size, increment_path
from yolosomi_tpu.utils.metrics import fitness


def train(hyp: dict, opt) -> float:
    # seed host RNGs for reproducible augmentation (reference: init_seeds,
    # torch_utils.py; train.py:87)
    import random as _rnd

    _rnd.seed(opt.seed)
    np.random.seed(opt.seed)
    save_dir = increment_path(Path(opt.project) / opt.name, exist_ok=opt.exist_ok, mkdir=True)
    (save_dir / "weights").mkdir(parents=True, exist_ok=True)
    last, best = save_dir / "weights" / "last.ckpt", save_dir / "weights" / "best.ckpt"
    save_yaml(save_dir / "hyp.yaml", hyp)
    save_yaml(save_dir / "opt.yaml", vars(opt))

    # W&B artifact plane (reference wandb_utils.py:108-516; no-op without
    # the wandb package — unlike the reference, which force-disables it,
    # train.py:80)
    from yolosomi_tpu.utils.wandb_utils import WandbLogger, is_wandb_artifact

    wb = WandbLogger(opt, name=save_dir.name, project=Path(opt.project).name)
    if opt.weights and is_wandb_artifact(opt.weights):
        opt.weights = wb.resume_checkpoint(opt.weights, download_dir=save_dir / "weights")

    data_dict = load_data_cfg(find_config(opt.data, "data"))
    nc = 1 if opt.single_cls else int(data_dict["nc"])
    names = data_dict.get("names", [str(i) for i in range(nc)])
    if getattr(opt, "upload_dataset", False):
        wb.log_dataset(data_dict)

    cfg = load_model_cfg(find_config(opt.cfg))
    dtype = jnp.bfloat16 if not opt.no_bf16 else jnp.float32
    model, meta = build_model(cfg, nc=nc, dtype=dtype)
    meta.names = names
    imgsz = check_img_size(opt.imgsz, s=int(max(meta.strides)))

    # loss gains auto-rescale (reference: train.py:211-214)
    nl = meta.nl
    hyp = dict(hyp)
    hyp["box"] *= 3.0 / nl
    hyp["cls"] *= nc / 80.0 * 3.0 / nl
    hyp["obj"] *= (imgsz / 640) ** 2 * 3.0 / nl

    cache_mode = getattr(opt, "cache", "") or ""
    if cache_mode is True:  # pre-round-3 opt.yaml stored --cache as a bool
        cache_mode = "ram"
    if cache_mode not in ("", "ram", "device"):
        raise SystemExit(f"--cache {cache_mode!r}: expected 'ram' or 'device'")
    device_cache = cache_mode == "device"
    if device_cache:
        # --cache device: the whole train split lives in HBM; the host only
        # plans randomness. mosaic/perspective/mixup pixels are built on
        # device (ops/mosaic_device.py), HSV/flips run in the train step, so
        # the only host pipeline left is label geometry. Incompatible planes
        # fall back to host loading with a warning.
        blockers = [
            k for k, on in (
                ("rect", opt.rect), ("quad", getattr(opt, "quad", False)),
                ("copy_paste", hyp.get("copy_paste", 0.0) > 0),
            ) if on
        ]
        if blockers:
            LOGGER.warning(f"--cache device does not support {blockers}; using host pipeline")
            device_cache = False
        else:
            opt.device_preprocess = True
            LOGGER.info(
                "--cache device: Albumentations plane (Blur/MedianBlur/ToGray/CLAHE) is "
                "host-only and inactive in this mode (it is an optional plane in the "
                "reference too — active only when the package is installed)"
            )

    ds_hyp = dict(hyp)
    if opt.device_preprocess:
        # HSV + flips move into the jitted train step (ops/preprocess.py);
        # zero them in the host pipeline so they are not applied twice
        for k in ("hsv_h", "hsv_s", "hsv_v", "fliplr", "flipud"):
            ds_hyp[k] = 0.0
    train_ds = DetectionDataset(
        data_dict["train"], img_size=imgsz, batch_size=opt.batch_size, augment=True,
        hyp=ds_hyp, rect=opt.rect, stride=int(max(meta.strides)), max_labels=opt.max_labels,
        cache_images=cache_mode == "ram",
    )
    train_loader = DataLoader(train_ds, opt.batch_size, shuffle=not opt.rect, drop_last=True,
                              workers=getattr(opt, "workers", 8),
                              quad=getattr(opt, "quad", False), plan=device_cache)
    if getattr(opt, "sync_bn", False):
        LOGGER.info("--sync-bn: BN statistics are always global-batch under jit (SyncBN by construction)")
    nb = len(train_loader)

    ckpt = None
    if opt.weights and Path(opt.weights).exists():
        ckpt = load_checkpoint(opt.weights)

    if opt.resume and ckpt is not None and ckpt.get("anchors") is not None:
        # adopt the run's (autoanchor-refined) anchors — resume must not
        # change the decode geometry mid-run, and re-running autoanchor
        # here would just be discarded work
        model, meta = build_model(
            cfg, nc=nc, anchors=np.asarray(ckpt["anchors"], np.float32).tolist(), dtype=dtype
        )
        meta.names = names
    elif not opt.noautoanchor:
        # autoanchor (reference: train.py:203-204, autoanchor.py:25)
        from yolosomi_tpu.utils.autoanchor import check_anchors

        new_anchors = check_anchors(train_ds, meta, thr=hyp["anchor_t"], imgsz=imgsz, kmean=opt.kmean)
        if new_anchors is not None:
            model, meta = build_model(cfg, nc=nc, anchors=new_anchors.tolist(), dtype=dtype)
            meta.names = names

    variables = init_model(model, meta, rng=jax.random.PRNGKey(opt.seed), imgsz=min(imgsz, 256))

    start_epoch, best_fitness = 0, 0.0
    if ckpt is not None:
        # transfer-learn: intersect by tree path + shape (reference:
        # train.py:102-108 intersect_dicts)
        flat_new = dict(jax.tree_util.tree_flatten_with_path(variables["params"])[0])
        flat_old = dict(jax.tree_util.tree_flatten_with_path({"p": ckpt["params"]})[0])
        loaded = 0
        merged = {}
        for k, v in flat_new.items():
            ko = tuple([jax.tree_util.DictKey("p")] + list(k))
            if ko in flat_old and flat_old[ko].shape == v.shape:
                merged[k] = jnp.asarray(flat_old[ko])
                loaded += 1
            else:
                merged[k] = v
        treedef = jax.tree_util.tree_structure(variables["params"])
        variables = dict(variables)
        variables["params"] = jax.tree_util.tree_unflatten(
            treedef, [merged[k] for k, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]]
        )
        LOGGER.info(f"transferred {loaded}/{len(flat_new)} params from {opt.weights}")
        if opt.resume:
            start_epoch = int(ckpt.get("epoch", -1)) + 1
            best_fitness = float(ckpt.get("best_fitness", 0.0))

    # grad accumulation to nominal batch 64 (reference: train.py:119-123)
    nbs = 64
    accumulate = max(round(nbs / opt.batch_size), 1) if opt.accumulate else 1
    optimizer = make_optimizer(
        hyp, nb=max(nb // accumulate, 1), epochs=opt.epochs, batch_size=opt.batch_size,
        accumulate=accumulate, adam=opt.adam, linear_lr=opt.linear_lr,
    )
    state = create_train_state(dict(variables), optimizer, accumulate=accumulate)
    if start_epoch > 0:
        # full resume: optimizer momentum/schedule state + EMA from the
        # checkpoint (reference: train.py:151-163)
        from flax import serialization as _ser

        from yolosomi_tpu.engine.ema import EMAState

        updates = {"step": jnp.asarray(start_epoch * nb, jnp.int32)}
        if "opt_state" in ckpt:
            try:
                updates["opt_state"] = _ser.from_state_dict(state.opt_state, ckpt["opt_state"])
            except Exception as e:
                LOGGER.warning(f"resume: optimizer state not restored ({e}); fast-forwarding schedule only")
                updates["opt_state"] = state.opt_state._replace(
                    step=jnp.asarray(start_epoch * max(nb // accumulate, 1), jnp.int32)
                )
        if ckpt.get("ema_params"):
            updates["ema"] = EMAState(
                variables={
                    "params": jax.tree_util.tree_map(jnp.asarray, ckpt["ema_params"]),
                    "batch_stats": jax.tree_util.tree_map(jnp.asarray, ckpt.get("ema_batch_stats", {})),
                },
                updates=jnp.asarray(int(ckpt.get("ema_updates", 0)), jnp.int32),
            )
        state = state._replace(**updates)

    if meta.head_type in ("DetectYOLOv8", "DetectYOLO8Head", "DetectV8", "DetectYolov11", "DetectV11"):
        # anchor-free DFL heads train through the task-aligned assigner
        from yolosomi_tpu.losses_v8 import ComputeLossV8

        loss_fn = ComputeLossV8(meta, hyp)
    else:
        loss_fn = ComputeLoss(meta, hyp)
        loss_fn.rep = opt.rep

    teacher_vars = None
    if getattr(opt, "teacher", ""):
        # knowledge distillation (engine/distill.py): frozen teacher runs
        # inside the student's jitted step; requires matching anchor layout
        # (width/depth-scaled variants of one config)
        from yolosomi_tpu.engine.checkpoint import load_artifact
        from yolosomi_tpu.engine.distill import wrap_loss_with_distillation

        if meta.head_type in ("DetectYOLOv8", "DetectYOLO8Head", "DetectV8", "DetectYolov11", "DetectV11"):
            raise SystemExit("--teacher: distillation supports anchor-based heads only "
                             "(anchor-free DFL soft targets not implemented)")
        t_vars, t_anchors = load_artifact(opt.teacher)
        t_cfg = load_model_cfg(find_config(getattr(opt, "teacher_cfg", "") or opt.cfg))
        t_model, t_meta = build_model(
            t_cfg, nc=nc,
            anchors=t_anchors.reshape(t_anchors.shape[0], -1).tolist() if t_anchors is not None else None,
            dtype=dtype,
        )
        # level-mapped distillation: each student level learns from the
        # teacher level with the SAME stride, so a P3-P5 student (e.g.
        # yolo-somi-t-p3) distills from the P2-P5 flagship by skipping the
        # teacher's 160^2 plane.
        t_strides = [int(s) for s in t_meta.strides]
        try:
            level_map = tuple(t_strides.index(int(s)) for s in meta.strides)
        except ValueError:
            raise SystemExit(
                f"--teacher: student strides {[int(s) for s in meta.strides]} are not a "
                f"subset of teacher strides {t_strides} — no level mapping exists")
        if np.asarray(t_meta.anchors_px).shape[1] != np.asarray(meta.anchors_px).shape[1]:
            raise SystemExit(
                "--teacher: anchors-per-level differ between teacher "
                f"({np.asarray(t_meta.anchors_px).shape[1]}) and student "
                f"({np.asarray(meta.anchors_px).shape[1]}) — soft targets are per-anchor")
        if level_map != tuple(range(len(meta.strides))):
            LOGGER.info(f"distillation: level map student->teacher = {list(level_map)} "
                        f"(teacher strides {t_strides})")

        hint = float(getattr(opt, "distill_hint", 0.0) or 0.0)

        def teacher_apply(variables, images):
            return t_model.apply(variables, images, train=False, features=hint > 0.0)

        if hint > 0.0:
            # FitNets hint term: plant one (Cs_i, Ct_i) 1x1 adapter per
            # student level into the params tree (flax ignores unknown
            # param subtrees at apply, so inference is unaffected; the
            # optimizer learns them jointly — engine/distill.py hint_loss)
            _sz = int(max(meta.strides)) * 4  # smallest size every level is nonempty at
            dummy = jnp.zeros((1, _sz, _sz, 3), jnp.float32)
            s_shapes = jax.eval_shape(
                lambda v, x: model.apply(v, x, train=False, features=True), variables, dummy)[1]
            t_vars_shape = {"params": t_vars["params"], "batch_stats": t_vars.get("batch_stats", {})}
            t_shapes = jax.eval_shape(
                lambda v, x: t_model.apply(v, x, train=False, features=True), t_vars_shape, dummy)[1]
            t_shapes = [t_shapes[j] for j in level_map]
            rng_a = jax.random.PRNGKey(opt.seed + 7)
            variables = dict(variables)
            variables["params"] = dict(variables["params"])
            for i, (ss, ts) in enumerate(zip(s_shapes, t_shapes)):
                cs, ct = int(ss.shape[-1]), int(ts.shape[-1])
                rng_a, k = jax.random.split(rng_a)
                variables["params"][f"kd_adapter_{i}"] = {
                    "kernel": jax.random.normal(k, (cs, ct), jnp.float32) * (1.0 / np.sqrt(cs))
                }
            LOGGER.info(
                f"distillation: hint={hint} adapters "
                f"{[(int(s.shape[-1]), int(t.shape[-1])) for s, t in zip(s_shapes, t_shapes)]}")
            # the TrainState above was built before the adapters existed —
            # rebuild so the optimizer tracks them (hint distillation is a
            # fresh-training recipe; a --resume'd optimizer state would not
            # cover the new adapter leaves anyway)
            if start_epoch > 0:
                LOGGER.warning("--distill-hint with --resume: optimizer state restarts "
                               "(adapter params are new leaves)")
            state = create_train_state(dict(variables), optimizer, accumulate=accumulate)

        loss_fn = wrap_loss_with_distillation(
            loss_fn, teacher_apply, meta, alpha=getattr(opt, "distill", 1.0),
            teacher_anchors_px=np.asarray(t_meta.anchors_px)[list(level_map)],
            level_map=level_map, hint=hint,
        )
        # one device-resident copy, threaded through the step as an ARG
        # (a closure constant would be re-embedded per compiled program)
        teacher_vars = jax.tree_util.tree_map(jnp.asarray, t_vars)
        LOGGER.info(f"distillation: teacher={opt.teacher} alpha={getattr(opt, 'distill', 1.0)}")

    mesh = create_mesh()
    gs = int(max(meta.strides))
    if opt.multi_scale:
        # quantized multi-scale sizes, one compiled program each (the
        # TPU-shaped version of the reference's per-batch +-50% jitter)
        sizes = sorted({max(int(imgsz * f) // gs * gs, gs) for f in (0.67, 0.83, 1.0, 1.17, 1.33)})
        train_steps = {
            s: make_train_step(model, loss_fn, optimizer, mesh=mesh, scale_to=s, accumulate=accumulate,
                               device_preprocess=dict(hyp, seed=opt.seed) if opt.device_preprocess else None,
                               freeze=getattr(opt, "freeze", 0),
                               device_mosaic=imgsz if device_cache else None,
                               remat_segments=getattr(opt, "remat", 0))
            for s in sizes
        }
        LOGGER.info(f"multi-scale sizes: {sizes}")
    else:
        train_steps = {imgsz: make_train_step(
            model, loss_fn, optimizer, mesh=mesh, accumulate=accumulate,
            device_preprocess=dict(hyp, seed=opt.seed) if opt.device_preprocess else None,
            freeze=getattr(opt, "freeze", 0),
            device_mosaic=imgsz if device_cache else None,
            remat_segments=getattr(opt, "remat", 0))}
    import random as _random

    with mesh:
        state = replicate_tree(state, mesh)
        if teacher_vars is not None:
            teacher_vars = replicate_tree(teacher_vars, mesh)

    image_cache = None
    if device_cache:
        from yolosomi_tpu.ops.mosaic_device import build_device_cache

        slab, _ = build_device_cache(train_ds)
        LOGGER.info(f"--cache device: uploading {slab.nbytes / 1e9:.2f} GB train slab to HBM")
        with mesh:
            image_cache = replicate_tree(slab, mesh)
        del slab

    stopper = EarlyStopping(patience=opt.patience)
    LOGGER.info(
        f"Image sizes {imgsz} train/val, {len(train_ds)} images, {nb} batches/epoch, "
        f"{jax.device_count()} device(s). Starting training for {opt.epochs} epochs..."
    )

    val_runner = Runner(opt.cfg, None, nc=nc, dtype=dtype, imgsz=imgsz)
    val_runner.model, val_runner.meta = model, meta
    # build the val dataloader ONCE: val.run(dataloader=None) re-decodes,
    # re-letterboxes and re-uploads every val image on every epoch
    val_loader = DataLoader(
        DetectionDataset(data_dict["val"], img_size=imgsz, batch_size=opt.batch_size,
                         augment=False, rect=False, stride=int(max(meta.strides)), pad=0.5),
        opt.batch_size, shuffle=False,
    )
    results_file = save_dir / "results.csv"

    t0 = time.time()
    final_epoch = start_epoch
    maps = np.zeros(nc)  # per-class mAP for image-weight sampling
    ckpt_writer = AsyncCheckpointer()
    watchdog_stop = None
    if os.environ.get("TRAIN_WATCHDOG"):
        # stall localizer: dump the main thread's stack periodically
        import sys
        import threading
        import traceback

        main_id = threading.get_ident()
        watchdog_stop = threading.Event()

        def _watch():
            while not watchdog_stop.wait(15):
                frame = sys._current_frames().get(main_id)
                if frame is not None:
                    stack = traceback.extract_stack(frame)
                    top = " <- ".join(f"{Path(s.filename).name}:{s.lineno}({s.name})" for s in stack[-4:])
                    LOGGER.info(f"[watchdog] main at {top}")

        threading.Thread(target=_watch, daemon=True, name="watchdog").start()
    from concurrent.futures import ThreadPoolExecutor

    # single-slot transfer thread: device_put of the next batch overlaps
    # the current step's device execution (the tunnel upload is the
    # train-loop bottleneck; see PERF.md round-3 loop pipelining)
    xfer = ThreadPoolExecutor(max_workers=1)
    prev_best_fitness = best_fitness
    last_results = (0, 0, 0, 0, 0, 0, 0)
    for epoch in range(start_epoch, opt.epochs):
        final_epoch = epoch
        mloss = np.zeros(3)
        t_ep = time.time()
        if opt.image_weights:
            # class-error-weighted image sampling (reference: train.py:236-241)
            from yolosomi_tpu.utils.general import labels_to_class_weights, labels_to_image_weights

            cw = labels_to_class_weights(train_ds.labels, nc) * (1 - maps) ** 2 / nc
            train_loader.sample_weights = labels_to_image_weights(train_ds.labels, nc, cw)
        with mesh:
            # Pipelined inner loop. Through the remote-TPU tunnel a b24
            # 640px uint8 upload costs seconds; the naive
            # upload -> step -> fetch-metrics sequence serializes all
            # three (measured 12.5 s/batch vs the 0.3 s step). Overlap:
            # a transfer thread uploads batch i+1 while the device runs
            # step i, and metrics for batch i are fetched only AFTER
            # step i+1 is dispatched (one-batch lag), so the host never
            # blocks the device pipeline.
            def _upload(item):
                imgs, tgts, _, _ = item
                return shard_batch({"images": imgs, "targets": tgts}, mesh)

            t_pre0 = time.time()
            it = iter(train_loader)
            first = next(it, None)
            fut = xfer.submit(_upload, first) if first is not None else None
            t_pre = time.time() - t_pre0
            pending = None  # (batch index, on-device metrics) awaiting fetch
            n_logged = 0
            n_skipped = 0
            i = 0
            t_wait = t_disp = t_fetch = 0.0
            while fut is not None:
                t_a = time.time()
                batch = fut.result()
                nxt = next(it, None)
                fut = xfer.submit(_upload, nxt) if nxt is not None else None
                t_b = time.time()
                step_fn = train_steps[_random.choice(list(train_steps))]
                imgs_arg = (image_cache, batch["images"]) if device_cache else batch["images"]
                if teacher_vars is not None:
                    state, metrics = step_fn(state, imgs_arg, batch["targets"], teacher_vars)
                else:
                    state, metrics = step_fn(state, imgs_arg, batch["targets"])
                t_c = time.time()
                t_wait += t_b - t_a
                t_disp += t_c - t_b
                if pending is not None:
                    j, pm = pending
                    m = jax.device_get(pm)
                    mloss = (mloss * n_logged + np.array([m["lbox"], m["lobj"], m["lcls"]])) / (n_logged + 1)
                    n_logged += 1
                    ok = bool(m.get("grads_finite", True))
                    n_skipped += not ok
                    LOGGER.info(
                        f"epoch {epoch}/{opt.epochs - 1} batch {j}/{nb} "
                        f"box {m['lbox']:.4f} obj {m['lobj']:.4f} cls {m['lcls']:.4f}"
                        f"{'' if ok else ' SKIPPED(non-finite grads)'}"
                    )
                t_fetch += time.time() - t_c
                pending = (i, metrics) if i % max(nb // 10, 1) == 0 else None
                i += 1
            t_fin0 = time.time()
            if pending is not None:
                j, pm = pending
                m = jax.device_get(pm)
                mloss = (mloss * n_logged + np.array([m["lbox"], m["lobj"], m["lcls"]])) / (n_logged + 1)
                LOGGER.info(
                    f"epoch {epoch}/{opt.epochs - 1} batch {j}/{nb} "
                    f"box {m['lbox']:.4f} obj {m['lobj']:.4f} cls {m['lcls']:.4f}"
                )
            LOGGER.info(
                f"epoch {epoch} loop: first-batch {t_pre:.1f}s upload-wait {t_wait:.1f}s "
                f"dispatch {t_disp:.1f}s metric-fetch {t_fetch:.1f}s "
                f"final-fetch {time.time() - t_fin0:.1f}s"
            )
            if n_skipped:
                LOGGER.warning(
                    f"epoch {epoch}: {n_skipped}/{n_logged} logged steps SKIPPED on "
                    f"non-finite gradients — the model is not learning on those batches"
                )

        # per-epoch val with EMA weights (reference: train.py:291-303)
        t_val0 = time.time()
        results = (0, 0, 0, 0, 0, 0, 0)
        val_due = (epoch % max(getattr(opt, "val_period", 1), 1)) == 0
        val_ran = (not opt.noval and val_due) or epoch == opt.epochs - 1
        if val_ran:
            # EMA weights stay on device: a host round trip here moves the
            # full parameter tree through the tunnel twice per epoch.
            # Safe because the train step does not donate its state
            # (engine/trainer.py donate default). The infer cache stays
            # warm — variables are call arguments, so no recompile either.
            val_runner.variables = ema_variables(state)
            results, maps, _ = validate.run(
                data_dict, batch_size=opt.batch_size, imgsz=imgsz, runner=val_runner,
                project=str(save_dir), name="val", exist_ok=True, names=names,
                single_cls=opt.single_cls, compute_loss=loss_fn, dataloader=val_loader,
            )
        LOGGER.info(f"epoch {epoch} val total {time.time() - t_val0:.1f}s")
        if not val_ran:
            # --val-period skip epoch: carry the last measured metrics
            # forward so results.csv / W&B fitness curves do not oscillate
            # to zero between validated epochs (ADVICE r4).
            results = last_results
        fi = fitness(np.array(results[:4]))
        last_results = results
        with open(results_file, "a") as f:
            if epoch == start_epoch and f.tell() == 0:
                f.write("epoch,box,obj,cls,P,R,mAP50,mAP,fitness\n")
            f.write(
                f"{epoch},{mloss[0]:.5f},{mloss[1]:.5f},{mloss[2]:.5f},"
                + ",".join(f"{x:.5f}" for x in results[:4])
                + f",{fi:.5f}\n"
            )
        if fi > best_fitness:
            best_fitness = fi
        payload = {
            "train/box_loss": float(mloss[0]), "train/obj_loss": float(mloss[1]),
            "train/cls_loss": float(mloss[2]),
        }
        if val_ran:
            payload.update(
                {
                    "metrics/precision": float(results[0]),
                    "metrics/recall": float(results[1]),
                    "metrics/mAP_0.5": float(results[2]),
                    "metrics/mAP_0.5:0.95": float(results[3]),
                    "metrics/fitness": float(fi),
                }
            )
        wb.end_epoch(payload, step=epoch)
        # async checkpointing: enqueue a reference to the (immutable)
        # device state; the writer thread pulls + serializes while the
        # TPU runs the next epoch. The synchronous version cost
        # ~20 s/epoch on the tunnel runtime (0.7 GB device_get + msgpack
        # on one host core).
        if not getattr(opt, "nosave", False) or epoch == opt.epochs - 1:
            # --ckpt-period N thins last/best to every N epochs + strict
            # fitness improvements + the final epoch. On the tunnel
            # runtime the mandatory device->host transfer of the 805 MB
            # state runs at ~10-40 MB/s, so every-epoch saves (reference
            # semantics, the default) cost 20-90 s/epoch there.
            cp = max(getattr(opt, "ckpt_period", 1), 1)
            improved = fi > prev_best_fitness
            prev_best_fitness = max(prev_best_fitness, fi)
            # NOTE: `epoch == final_epoch` must NOT appear here — final_epoch
            # tracks the current epoch, so it would save every epoch and (for
            # >max_hold_bytes states) stall the loop on a synchronous full-
            # state transfer each time (observed: ~100 s/epoch on the tunnel)
            if epoch % cp == 0 or improved or epoch == opt.epochs - 1:
                paths = [last]
                if fi == best_fitness:
                    paths.append(best)
                sp = getattr(opt, "save_period", -1)
                if sp > 0 and epoch % sp == 0:
                    paths.append(last.parent / f"epoch{epoch}.ckpt")
                # one snapshot + one blob for all targets of this epoch
                ckpt_writer.save(paths, state, epoch=epoch, best_fitness=best_fitness,
                                 anchors=np.asarray(meta.anchors_px).reshape(meta.nl, -1).tolist())
        LOGGER.info(f"epoch {epoch} done in {time.time() - t_ep:.1f}s fitness {fi:.4f}")
        if val_ran and stopper(epoch, fi):
            LOGGER.info(f"early stopping at epoch {epoch} (patience {opt.patience})")
            # the early-stop epoch IS the final epoch: save even under
            # --nosave (reference semantics: --nosave keeps only the final)
            ckpt_writer.save([last], state, epoch=epoch, best_fitness=best_fitness,
                             anchors=np.asarray(meta.anchors_px).reshape(meta.nl, -1).tolist())
            break

    ckpt_writer.close()
    xfer.shutdown(wait=False)
    if watchdog_stop is not None:
        watchdog_stop.set()
    LOGGER.info(f"{final_epoch - start_epoch + 1} epochs in {(time.time() - t0) / 3600:.2f}h")
    for f in (last, best):
        if f.exists():
            strip_checkpoint(f, f.with_suffix(".msgpack"))
            wb.log_checkpoint(
                f.with_suffix(".msgpack"), epoch=final_epoch,
                fitness=float(best_fitness), best=f is best,
            )
    wb.finish()
    return best_fitness


def parse_opt(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, default="", help="initial weights (.ckpt/.msgpack)")
    parser.add_argument("--cfg", type=str, default="yolo-somi")
    parser.add_argument("--data", type=str, default="visdrone")
    parser.add_argument("--hyp", type=str, default="hyp.visdrone")
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    parser.add_argument("--rect", action="store_true")
    parser.add_argument("--multi-scale", action="store_true", help="quantized multi-scale training")
    parser.add_argument("--accumulate", action="store_true", help="gradient accumulation to nominal batch 64")
    parser.add_argument("--image-weights", action="store_true", help="class-error-weighted image sampling")
    parser.add_argument("--quad", action="store_true",
                        help="quad collate: groups of 4 -> one 2x-size image (reference collate_fn4)")
    parser.add_argument("--resume", nargs="?", const=True, default=False)
    parser.add_argument("--evolve", type=int, nargs="?", const=300, default=0, help="evolve hyps for N generations")
    parser.add_argument("--noval", action="store_true")
    parser.add_argument("--val-period", type=int, default=1, metavar="N",
                        help="validate every N epochs (always on the final epoch); "
                             "best-fitness/early-stop update only on val epochs")
    parser.add_argument("--noautoanchor", action="store_true")
    parser.add_argument("--kmean", action="store_true", help="k-means++ autoanchor (reference --kmean)")
    parser.add_argument("--adam", action="store_true")
    parser.add_argument("--linear-lr", action="store_true")
    parser.add_argument("--single-cls", action="store_true")
    parser.add_argument("--rep", action="store_true", help="enable repulsion loss")
    parser.add_argument("--device-preprocess", action="store_true",
                        help="run HSV/flip augmentation fused on device inside the train step")
    parser.add_argument("--label-smoothing", type=float, default=0.0)
    parser.add_argument("--patience", type=int, default=100)
    parser.add_argument("--project", default="runs/train")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--exist-ok", action="store_true")
    parser.add_argument("--device", type=str, default="", help="jax platform: cpu or tpu")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-labels", type=int, default=300)
    parser.add_argument("--no-bf16", action="store_true")
    parser.add_argument("--freeze", type=int, default=0,
                        help="freeze the first N layers (reference train.py --freeze)")
    parser.add_argument("--teacher", type=str, default="",
                        help="distillation teacher checkpoint (.ckpt/.msgpack); "
                             "student learns teacher soft targets (engine/distill.py)")
    parser.add_argument("--teacher-cfg", type=str, default="",
                        help="teacher model config (defaults to --cfg)")
    parser.add_argument("--distill", type=float, default=1.0,
                        help="distillation loss weight alpha")
    parser.add_argument("--distill-hint", type=float, default=0.0,
                        help="feature-hint distillation weight (1x1 adapter to teacher "
                             "head-input features, masked to teacher-confident cells)")
    parser.add_argument("--ckpt-period", type=int, default=1,
                        help="save last/best every N epochs (+ improvements and final); "
                             "1 = reference every-epoch semantics")
    parser.add_argument("--save-period", type=int, default=-1,
                        help="also save a checkpoint every N epochs")
    parser.add_argument("--nosave", action="store_true", help="only save the final checkpoint")
    parser.add_argument("--cache", type=str, nargs="?", const="ram", default="",
                        help="image cache: ram (host, reference --cache ram) or "
                             "device (HBM slab + on-device mosaic/perspective/mixup)")
    parser.add_argument("--workers", type=int, default=8,
                        help="loader worker threads (reference --workers)")
    parser.add_argument("--remat", type=int, default=0, metavar="N",
                        help="activation rematerialization: cut the graph into N jax.checkpoint "
                             "segments (saves backward memory, costs ~1 extra forward)")
    parser.add_argument("--upload-dataset", action="store_true",
                        help="upload the dataset as a W&B artifact (reference: wandb --upload_dataset)")
    parser.add_argument("--sync-bn", action="store_true",
                        help="accepted for CLI parity; BN stats are ALWAYS global-batch under jit (SyncBN by construction)")
    return parser.parse_args(argv)


def main(opt):
    from yolosomi_tpu.utils.general import get_latest_run, select_device

    select_device(getattr(opt, "device", ""))
    if opt.resume and not opt.weights:
        # bare --resume: pick the most recent run and restore its opt.yaml
        # (reference: train.py:406-412 + get_latest_run)
        last = opt.resume if isinstance(opt.resume, str) else get_latest_run(opt.project)
        assert last, f"no last.ckpt found under {opt.project} to resume"
        import yaml as _yaml

        opt_yaml = Path(last).parents[1] / "opt.yaml"
        if opt_yaml.exists():
            saved = _yaml.safe_load(opt_yaml.read_text())
            for k, v in saved.items():
                if k not in ("resume", "weights", "exist_ok") and hasattr(opt, k):
                    setattr(opt, k, v)
        opt.weights, opt.exist_ok = str(last), True
        LOGGER.info(f"resuming from {last}")
    hyp = load_hyp(find_config(opt.hyp, "hyps"))
    if opt.label_smoothing:
        hyp["label_smoothing"] = opt.label_smoothing
    if opt.evolve:
        # GA over hyps (reference: train.py:436-503): mutate -> short train
        # -> log fitness -> repeat; plots evolve.png at the end
        from yolosomi_tpu.engine.evolve import log_generation, mutate

        evolve_dir = Path(opt.project) / "evolve"
        evolve_dir.mkdir(parents=True, exist_ok=True)
        evolve_csv = evolve_dir / "evolve.csv"
        opt.noval, opt.exist_ok = False, True
        base_name = opt.name
        best = 0.0
        for gen in range(int(opt.evolve)):
            hyp_g = mutate(hyp, evolve_csv)
            opt.name = f"{base_name}_gen{gen}"
            fi = train(dict(hyp_g), opt)
            log_generation(evolve_csv, hyp_g, fi)
            best = max(best, fi)
        try:
            from yolosomi_tpu.utils.plots import plot_evolve

            plot_evolve(evolve_csv)
        except Exception as e:
            LOGGER.warning(f"plot_evolve failed: {e}")
        LOGGER.info(f"evolution complete: best fitness {best:.4f} ({evolve_csv})")
        return best
    return train(hyp, opt)


if __name__ == "__main__":
    main(parse_opt())
