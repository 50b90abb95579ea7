"""Post-training int8 quantization for the serving path.

The bf16 compute ceiling of the flagship graph is ~807 img/s/chip on v5e
(PERF.md speed-of-light); the 2,000 img/s target needs the int8 MXU path
(~394 TOPS). This module drives the int8 mode built into ConvRaw
(models/layers.py): symmetric per-tensor activation scales calibrated
from representative batches + per-out-channel weight scales computed
in-graph, int32 accumulation.

Usage:
    quant = calibrate(model, variables, [batch1, batch2, ...])
    variables_q = dict(variables, quant=quant)
    with quant_mode("int8"):
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
        out = fn(variables_q, images)   # traced with int8 convs

The reference's only int8 story is the TFLite export flag
(export.py:182); this is a first-class serving path instead.
"""

from __future__ import annotations

import contextlib
from typing import Iterable

import jax
import jax.numpy as jnp

from yolosomi_tpu.models.layers import QUANT_ACT_PER_CHANNEL, QUANT_EXCLUDE, QUANT_MODE


@contextlib.contextmanager
def quant_mode(mode, exclude=(), per_channel=False):
    """Trace-time switch; wrap model.apply (or its jit) in this.

    exclude: regex patterns matched against each ConvRaw's slash-joined
    flax path; matching convs stay float even in int8 mode (per-layer
    sensitivity exclusion — e.g. the detect-head convs).

    per_channel: calib-mode only — sow (Cin,) per-channel activation
    absmax instead of a scalar; the int8 forward auto-detects the scale
    shape, so inference traces need no flag."""
    prev = QUANT_MODE[0]
    prev_ex = QUANT_EXCLUDE[0]
    prev_pc = QUANT_ACT_PER_CHANNEL[0]
    QUANT_MODE[0] = mode
    QUANT_EXCLUDE[0] = tuple(exclude)
    QUANT_ACT_PER_CHANNEL[0] = bool(per_channel)
    try:
        yield
    finally:
        QUANT_MODE[0] = prev
        QUANT_EXCLUDE[0] = prev_ex
        QUANT_ACT_PER_CHANNEL[0] = prev_pc


def _stats_to_scales(tree):
    """quant_stats collection -> quant collection: each sown ('absmax',)
    leaf becomes an 'a_scale' entry at the same module path."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k == "absmax":
                val = v[0] if isinstance(v, (tuple, list)) else v
                out["a_scale"] = jnp.asarray(val, jnp.float32)
            else:
                out[k] = _stats_to_scales(v)
        return out
    return tree


def calibrate(model, variables, batches: Iterable, train: bool = False,
              per_channel: bool = False):
    """Run representative batches in calib mode and return the 'quant'
    collection (per-conv activation absmax scales; `per_channel=True`
    stores (Cin,) scales — the mixed-scale-concat fix, PARETO.md r4)."""
    import inspect

    kw = {}
    if "train" in inspect.signature(type(model).__call__).parameters:
        kw["train"] = train
    stats = None
    with quant_mode("calib", per_channel=per_channel):
        fn = jax.jit(
            lambda v, x: model.apply(v, x, mutable=["quant_stats"], **kw)[1]["quant_stats"]
        )
        for batch in batches:
            x = jnp.asarray(batch)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            s = jax.device_get(fn(variables, x))
            if stats is None:
                stats = s
            else:
                stats = jax.tree_util.tree_map(lambda a, b: jnp.maximum(a, b), stats, s)
    assert stats, "calibration produced no statistics (no ConvRaw on the path?)"
    return _stats_to_scales(stats)


def quantized_infer_fn(runner, calib_images, exclude=(), per_channel=False, **nms_kw):
    """Build a jitted int8 end-to-end inference fn for a Runner:
    calibrates on `calib_images` (uint8 NHWC), then returns
    fn(images_u8) -> (B, max_det, 6) detections with int8 convs.
    `exclude`: path regexes kept in float (see quant_mode);
    `per_channel`: per-channel activation scales (see calibrate)."""
    variables = runner.variables
    quant = calibrate(runner.model, variables, [calib_images], per_channel=per_channel)
    variables_q = dict(variables)
    variables_q["quant"] = quant
    from yolosomi_tpu.ops.nms import non_max_suppression

    with quant_mode("int8", exclude=exclude):

        # variables enter as an ARGUMENT, not a closure: closed-over
        # device arrays serialize into the lowered module, and the
        # flagship's ~0.8 GB of weights overflow the remote-compile
        # relay's request limit (HTTP 413 — observed on the int8 val path;
        # the bf16 path always passed variables as an argument)
        @jax.jit
        def fn(v, images):
            x = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 else images
            preds = runner.model.apply(v, x, train=False)
            dec = runner._decode(preds)
            return non_max_suppression(dec, **nms_kw)

        # trace NOW (inside the mode) so the int8 branch is captured
        import numpy as np

        fn_lowered = fn.lower(variables_q, jnp.asarray(np.zeros_like(np.asarray(calib_images))))
    compiled = fn_lowered.compile()
    return lambda imgs: compiled(variables_q, jnp.asarray(imgs))
