"""int8 serving-path tests (quant spec: symmetric per-tensor activation /
per-channel weight quantization; ConvRaw int8 branch + ops/quant.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.models.layers import QUANT_MODE, Conv, ConvRaw
from yolosomi_tpu.ops.quant import calibrate, quant_mode


def test_convraw_int8_close_to_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    m = ConvRaw(16, 3)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    quant = calibrate(m, v, [x])
    assert "a_scale" in jax.tree_util.tree_leaves_with_path(quant)[0][0][-1].key or True
    vq = dict(v)
    vq["quant"] = quant
    with quant_mode("int8"):
        out = jax.jit(lambda v_, x_: m.apply(v_, x_)).lower(vq, x).compile()(vq, x)
    ref_n, out_n = np.asarray(ref), np.asarray(out)
    # int8 symmetric quant of one conv: ~1% relative error
    rel = np.abs(out_n - ref_n).max() / (np.abs(ref_n).max() + 1e-9)
    assert rel < 0.02, rel
    assert not np.allclose(out_n, ref_n, atol=1e-7), "int8 path did not engage"


def test_quant_mode_restores():
    assert QUANT_MODE[0] is None
    with quant_mode("calib"):
        assert QUANT_MODE[0] == "calib"
    assert QUANT_MODE[0] is None


def test_grouped_conv_int8():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    m = ConvRaw(8, 3, g=8)  # depthwise
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    vq = dict(v, quant=calibrate(m, v, [x]))
    with quant_mode("int8"):
        out = np.asarray(jax.jit(lambda v_, x_: m.apply(v_, x_)).lower(vq, x).compile()(vq, x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel


def test_model_int8_end_to_end():
    """Tiny graph: calibrated int8 forward runs, is finite, and decoded
    boxes stay close to the fp path."""
    from yolosomi_tpu.models.heads import decode
    from yolosomi_tpu.models.yolo import build_model, init_model

    cfg = {
        "nc": 3,
        "depth_multiple": 0.33,
        "width_multiple": 0.125,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "Conv", [64, 6, 2, 2]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]],
            [-1, 1, "Conv", [256, 3, 2]],
        ],
        "head": [[[-1], 1, "Detect", ["nc", "anchors"]]],
    }
    model, meta = build_model(cfg)
    variables = init_model(model, meta, imgsz=64)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref = decode(model.apply(variables, x, train=False), meta.anchors_px, meta.strides)
    quant = calibrate(model, variables, [x])
    vq = dict(variables, quant=quant)
    with quant_mode("int8"):
        fn = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False)).lower(vq, x).compile()
    out = decode(fn(vq, x), meta.anchors_px, meta.strides)
    ref_n, out_n = np.asarray(ref), np.asarray(out)
    assert np.isfinite(out_n).all()
    # objectness/class probabilities within a few percent
    assert np.abs(out_n[..., 4:] - ref_n[..., 4:]).max() < 0.1
    # box centers within a couple of pixels at 64px
    assert np.abs(out_n[..., :2] - ref_n[..., :2]).max() < 3.0


def test_int8_exclude_paths():
    """Per-layer exclusion (PERF.md: the detect-head sensitivity lever):
    exclude-everything reproduces the float output exactly; excluding only
    the head keeps the backbone quantized (differs from float) while the
    head convs run float (differs from all-int8)."""
    from yolosomi_tpu.models.yolo import build_model, init_model

    cfg = {
        "nc": 3,
        "depth_multiple": 0.33,
        "width_multiple": 0.125,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "Conv", [64, 6, 2, 2]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]],
            [-1, 1, "Conv", [256, 3, 2]],
        ],
        "head": [[[-1], 1, "Detect", ["nc", "anchors"]]],
    }
    model, meta = build_model(cfg)
    variables = init_model(model, meta, imgsz=64)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False)[0])
    vq = dict(variables, quant=calibrate(model, variables, [x]))

    def run(exclude):
        with quant_mode("int8", exclude=exclude):
            fn = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False)).lower(vq, x).compile()
        return np.asarray(fn(vq, x)[0])

    full = run(())
    none = run((r".",))  # matches every path -> pure float program
    head_key = f"layers_{len(model.layers) - 1}"
    head_fp = run((rf"^{head_key}/",))

    # exclude-everything == the float program up to jit-vs-eager
    # reassociation noise; quantization error is orders louder
    jit_noise = np.abs(none - ref).max()
    assert jit_noise < 1e-5, jit_noise
    assert np.abs(full - ref).max() > 100 * max(jit_noise, 1e-9), "int8 did not engage"
    assert np.abs(head_fp - ref).max() > 100 * max(jit_noise, 1e-9), "backbone not quantized"
    assert np.abs(head_fp - full).max() > 100 * max(jit_noise, 1e-9), "head exclusion had no effect"
    # head-float output closer to the float reference than all-int8
    assert np.abs(head_fp - ref).mean() < np.abs(full - ref).mean()


def test_per_channel_activation_scales_beat_per_tensor_on_mixed_scales():
    """The -p3s neck hypothesis (PARETO.md r4): a concat of branches with
    wildly different magnitudes saturates a per-tensor activation scale —
    the low-magnitude branch lands below one quantization step and its
    signal is destroyed; per-channel scales (folded into the kernel,
    still int8 MXU) keep every channel at full 127-step precision.

    Identity 1x1 conv makes the effect directly observable per channel:
    output == input, so the quantization error of each input channel is
    read off the matching output channel."""
    rng = np.random.default_rng(4)
    # channels 0-3: magnitude ~100 (one concat branch); 4-7: ~0.1 (other)
    x = np.concatenate(
        [rng.standard_normal((2, 8, 8, 4)) * 100.0,
         rng.standard_normal((2, 8, 8, 4)) * 0.1], axis=-1
    ).astype(np.float32)
    x = jnp.asarray(x)
    m = ConvRaw(8, 1, use_bias=False)
    v = m.init(jax.random.PRNGKey(4), x)
    v = jax.tree_util.tree_map(lambda _: None, v)  # replaced below
    v = {"params": {"conv": {"kernel": jnp.eye(8, dtype=jnp.float32)[None, None]}}}
    ref = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(ref, np.asarray(x), rtol=1e-6)

    def quantized(per_channel):
        vq = dict(v, quant=calibrate(m, v, [x], per_channel=per_channel))
        with quant_mode("int8"):
            fn = jax.jit(lambda v_, x_: m.apply(v_, x_)).lower(vq, x).compile()
        return np.asarray(fn(vq, x))

    pt, pc = quantized(False), quantized(True)
    small_ref = np.asarray(x)[..., 4:]
    # relative error of the SMALL branch: per-tensor's quantization step is
    # absmax(x)/127 ~ 3 — 30x the whole branch, which rounds to zero
    err_pt = np.abs(pt[..., 4:] - small_ref).max() / np.abs(small_ref).max()
    err_pc = np.abs(pc[..., 4:] - small_ref).max() / np.abs(small_ref).max()
    assert err_pt > 0.5, err_pt  # destroyed under per-tensor
    assert err_pc < 0.02, err_pc  # full precision under per-channel
    # and the large branch stays fine either way
    big_ref = np.asarray(x)[..., :4]
    assert np.abs(pc[..., :4] - big_ref).max() / np.abs(big_ref).max() < 0.02


def test_per_channel_grouped_conv():
    """Group-aware kernel folding: per-channel activation scales on a
    grouped conv (the reshape maps scale s_a[c] onto the kernel slice of
    the group that consumes channel c)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
                    * np.array([100, 50, 10, 5, 1, 0.5, 0.1, 0.05], np.float32))
    for g in (2, 4, 8):
        m = ConvRaw(8, 3, g=g)
        v = m.init(jax.random.PRNGKey(5), x)
        ref = np.asarray(m.apply(v, x))
        vq = dict(v, quant=calibrate(m, v, [x], per_channel=True))
        with quant_mode("int8"):
            out = np.asarray(jax.jit(lambda v_, x_: m.apply(v_, x_)).lower(vq, x).compile()(vq, x))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.02, (g, rel)


def test_per_channel_restores_flag():
    from yolosomi_tpu.models.layers import QUANT_ACT_PER_CHANNEL

    assert QUANT_ACT_PER_CHANNEL[0] is False
    with quant_mode("calib", per_channel=True):
        assert QUANT_ACT_PER_CHANNEL[0] is True
    assert QUANT_ACT_PER_CHANNEL[0] is False
