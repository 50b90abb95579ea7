"""Checkpoint save/load (reference: train.py:309-324, general.py:714-727).

The reference pickles the whole nn.Module into last.pt/best.pt
(SURVEY.md §5.4); here checkpoints are pure pytrees serialized with
flax msgpack — no module code in the file, loadable without the model
class. Layout mirrors the reference dict:

    {epoch, best_fitness, params, batch_stats,
     ema_params, ema_batch_stats, ema_updates, opt_state?, meta}

`strip_checkpoint` is the strip_optimizer equivalent: EMA promoted to
model, optimizer dropped, weights cast to bf16.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def build_checkpoint_payload(
    state, epoch: int = -1, best_fitness: float = 0.0, include_optimizer: bool = True,
    anchors=None,
) -> dict:
    """Pull the train state host-side into the checkpoint dict layout.
    This is the device->host transfer half of a save; serialization and
    disk writes can then run without touching device memory.

    `anchors`: the (possibly autoanchor-refined) per-level pixel anchors —
    the reference persists them inside the pickled model (m.anchors
    buffer); without them a refined run decodes wrongly after reload."""
    payload = {
        "epoch": epoch,
        "best_fitness": best_fitness,
        **({"anchors": np.asarray(anchors, np.float32)} if anchors is not None else {}),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "ema_params": _to_host(state.ema.variables["params"]),
        "ema_batch_stats": _to_host(state.ema.variables["batch_stats"]),
        "ema_updates": int(state.ema.updates),
        "step": int(state.step),
    }
    if include_optimizer:
        # to_state_dict flattens NamedTuple optimizer states into plain dicts
        payload["opt_state"] = serialization.to_state_dict(_to_host(state.opt_state))
    return payload


def write_checkpoint_payload(paths, payload: dict, meta_dict: Optional[dict] = None) -> None:
    """Serialize once, write the same blob to every path."""
    if isinstance(paths, (str, Path)):
        paths = [paths]
    blob = serialization.msgpack_serialize(payload)
    for path in paths:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        # atomic replace: a kill mid-write must never truncate an
        # existing checkpoint (observed: a SIGTERM during the async
        # writer's 800 MB write left last.ckpt unreadable)
        tmp = path.with_name(path.name + ".tmp")
        tmp.write_bytes(blob)
        os.replace(tmp, path)
        if meta_dict is not None:
            path.with_suffix(".json").write_text(json.dumps(meta_dict, default=str, indent=1))


def save_checkpoint(
    path,
    state,
    epoch: int = -1,
    best_fitness: float = 0.0,
    meta_dict: Optional[dict] = None,
    include_optimizer: bool = True,
    anchors=None,
) -> None:
    write_checkpoint_payload(
        path,
        build_checkpoint_payload(state, epoch, best_fitness, include_optimizer, anchors=anchors),
        meta_dict=meta_dict,
    )


def load_checkpoint(path) -> dict:
    return serialization.msgpack_restore(Path(path).read_bytes())


class AsyncCheckpointer:
    """Background checkpoint writer (orbax-async-style, SURVEY §5.4).

    Synchronous per-epoch checkpointing costs ~20-40 s/epoch on the
    tunnel runtime: device_get pulls the full train state (params +
    momentum + EMA, 805 MB fp32 measured on the flagship) at the
    tunnel's ~40 MB/s, then msgpack-serializes (~12 s) and writes (~8 s)
    on the single host core. The writer moves all of that off the
    training loop's critical path — with one hardware constraint:

    Holding a reference to the device state while the next epoch runs
    keeps an extra full state resident in HBM; on the flagship at
    640px b24 that +805 MB OOM'd the chip (observed). The tunnel
    backend exposes no memory_stats() to gate on, so retention is
    capped by `max_hold_bytes`: states larger than the cap have their
    device->host transfer done synchronously in save() (zero extra HBM;
    the caller pays only the transfer), and only serialization + disk
    writes run in the worker. Smaller states go fully async.

    save() takes one or many paths — one snapshot, one msgpack blob,
    N file writes — so the reference's every-epoch last+best pair costs
    one transfer, not two. Latest-wins per path group: if epoch N+1's
    save arrives while N's is still queued, N is dropped ('newest
    completed state' semantics unchanged). `wait()` drains the queue
    (call before strip/resume/exit)."""

    def __init__(self, max_hold_bytes: int = 256 * 1024 * 1024):
        import threading

        self.max_hold_bytes = max_hold_bytes
        self._lock = threading.Lock()
        self._pending: dict = {}  # key -> thunk() -> None
        self._event = threading.Event()
        self._stop = False
        self._error: Exception | None = None
        self._thread = threading.Thread(target=self._run, daemon=True, name="ckpt-writer")
        self._thread.start()

    @staticmethod
    def _state_bytes(state) -> int:
        return sum(getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(state))

    def save(self, paths, state, meta_dict=None, **kwargs) -> None:
        if isinstance(paths, (str, Path)):
            paths = [paths]
        paths = [str(p) for p in paths]
        if self._state_bytes(state) > self.max_hold_bytes:
            # big state: transfer now (no device memory retained), then
            # serialize + write in the background
            payload = build_checkpoint_payload(state, **kwargs)

            def job(paths=paths, payload=payload):
                write_checkpoint_payload(paths, payload, meta_dict=meta_dict)

        else:

            def job(paths=paths, state=state, kwargs=kwargs):
                write_checkpoint_payload(
                    paths, build_checkpoint_payload(state, **kwargs), meta_dict=meta_dict
                )

        with self._lock:
            self._pending[tuple(paths)] = job
        self._event.set()

    def _run(self):
        while True:
            self._event.wait()
            with self._lock:
                if not self._pending:
                    self._event.clear()
                    if self._stop:
                        return
                    continue
                key, job = next(iter(self._pending.items()))
                del self._pending[key]
            try:
                job()
            except Exception as e:  # surfaced on wait()
                self._error = e

    def wait(self) -> None:
        """Block until all queued saves hit disk; re-raise worker errors."""
        import time as _time

        while True:
            with self._lock:
                idle = not self._pending
            if idle and not self._event.is_set():
                break
            _time.sleep(0.05)
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def close(self) -> None:
        self.wait()
        self._stop = True
        self._event.set()
        self._thread.join(timeout=5)


def checkpoint_variables(ckpt: dict, ema: bool = True) -> dict:
    """Pick EMA weights when present, else raw model — the attempt_load
    contract (reference: experimental.py:97-101)."""
    if ema and "ema_params" in ckpt and ckpt["ema_params"]:
        return {"params": ckpt["ema_params"], "batch_stats": ckpt.get("ema_batch_stats", {})}
    return {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})}


def save_variables(path, variables: dict, meta_dict: Optional[dict] = None, anchors=None) -> None:
    """Save bare inference variables (weights-only artifact)."""
    payload = {
        "params": _to_host(variables["params"]),
        "batch_stats": _to_host(variables.get("batch_stats", {})),
    }
    if anchors is not None:
        payload["anchors"] = np.asarray(anchors, np.float32)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.msgpack_serialize(payload))
    if meta_dict is not None:
        path.with_suffix(".json").write_text(json.dumps(meta_dict, default=str, indent=1))


def load_variables(path) -> dict:
    return load_artifact(path)[0]


def load_artifact(path):
    """(variables, anchors-or-None) from a .msgpack or full .ckpt —
    anchors ride the artifact when autoanchor refined them at train time
    (the reference's m.anchors-buffer behavior, yolo.py/autoanchor)."""
    obj = serialization.msgpack_restore(Path(path).read_bytes())
    anchors = obj.get("anchors")
    anchors = np.asarray(anchors, np.float32) if anchors is not None else None
    if "ema_params" in obj:
        # full checkpoint passed: take EMA (the attempt_load contract).
        # NB the old test was `"params" not in obj`, which never fires on a
        # full checkpoint — inference on a .ckpt silently used the raw
        # last-step weights instead of EMA.
        return checkpoint_variables(obj), anchors
    return {"params": obj["params"], "batch_stats": obj.get("batch_stats", {})}, anchors


def strip_checkpoint(path, out_path=None, half: bool = True) -> None:
    """EMA -> model, drop optimizer, optionally cast to bf16
    (reference strip_optimizer: general.py:714-727)."""
    ckpt = load_checkpoint(path)
    variables = checkpoint_variables(ckpt, ema=True)
    if half:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            variables,
        )
    save_variables(out_path or path, variables, anchors=ckpt.get("anchors"))
