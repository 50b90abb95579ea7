"""Loss + target assignment tests (spec: reference utils/loss.py:112-262)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.losses import (
    ComputeLoss,
    bce_with_logits,
    build_targets_level,
    focal_modulation,
    pad_targets,
    slide_modulation,
    smooth_bce,
)
from yolosomi_tpu.utils.config import DEFAULT_HYP


class FakeMeta:
    nc = 4
    na = 3
    nl = 3
    anchors_grid = np.array(
        [
            [[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
            [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
            [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]],
        ],
        np.float32,
    )


def _targets(per_image_rows, bs=2, pad_to=8):
    """per_image_rows: list (len bs) of lists of [cls,x,y,w,h]."""
    labs = [np.array(r, np.float32).reshape(-1, 5) for r in per_image_rows]
    labs += [np.zeros((0, 5), np.float32)] * (bs - len(labs))
    return jnp.asarray(pad_targets(labs, pad_to))


def _preds(bs=2, nc=4, na=3, sizes=((8, 8), (4, 4), (2, 2)), seed=0):
    key = jax.random.PRNGKey(seed)
    out = []
    for i, (ny, nx) in enumerate(sizes):
        key, k = jax.random.split(key)
        out.append(jax.random.normal(k, (bs, ny, nx, na, nc + 5)) * 0.1)
    return out


def test_smooth_bce():
    cp, cn = smooth_bce(0.1)
    assert abs(cp - 0.95) < 1e-9 and abs(cn - 0.05) < 1e-9


def test_bce_matches_manual():
    logits = jnp.array([0.0, 2.0, -2.0])
    targets = jnp.array([1.0, 0.0, 1.0])
    out = np.asarray(bce_with_logits(logits, targets))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    expect = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_bce_pos_weight():
    logits = jnp.array([0.5])
    l1 = float(bce_with_logits(logits, jnp.array([1.0]), pos_weight=2.0)[0])
    l0 = float(bce_with_logits(logits, jnp.array([1.0]), pos_weight=1.0)[0])
    assert abs(l1 - 2 * l0) < 1e-6


def test_build_targets_center_cell():
    """A target near a cell center lands in that cell plus 2 neighbors."""
    t = np.full((8, 5), -1.0, np.float32)
    t[0] = [1, 0.55, 0.55, 0.2, 0.2]
    anchors = jnp.asarray(FakeMeta.anchors_grid[0])
    lt = build_targets_level(jnp.asarray(t), anchors, 8, 8, anchor_t=4.0)
    assert lt.mask.shape == (5 * 3 * 8,)
    n = int(lt.mask.sum())
    # x=4.4, y=4.4 grid units: base cell + left + top neighbors
    sel_cells = set(
        (int(gi), int(gj)) for gi, gj, m in zip(np.asarray(lt.gi), np.asarray(lt.gj), np.asarray(lt.mask)) if m
    )
    assert sel_cells == {(4, 4), (3, 4), (4, 3)}
    assert n % 3 == 0  # same cells per qualifying anchor


def test_build_targets_anchor_ratio_filter():
    t = np.full((4, 5), -1.0, np.float32)
    t[0] = [0, 0.5, 0.5, 0.9, 0.9]
    anchors = jnp.asarray([[1.0, 1.0]], jnp.float32)  # tiny anchor
    lt = build_targets_level(jnp.asarray(t), anchors, 8, 8, anchor_t=4.0)
    assert int(lt.mask.sum()) == 0  # ratio 7.2/1 > 4


def test_build_targets_padding_ignored():
    t = np.full((4, 5), -1.0, np.float32)
    anchors = jnp.asarray(FakeMeta.anchors_grid[0])
    lt = build_targets_level(jnp.asarray(t), anchors, 8, 8, anchor_t=4.0)
    assert int(lt.mask.sum()) == 0


def test_loss_runs_and_positive():
    loss_fn = ComputeLoss(FakeMeta(), dict(DEFAULT_HYP))
    preds = _preds()
    t = _targets([[[1, 0.5, 0.5, 0.2, 0.3]], [[2, 0.3, 0.7, 0.1, 0.1]]])
    total, comps = loss_fn(preds, t)
    assert np.isfinite(float(total)) and float(total) > 0
    assert comps.shape == (3,)
    assert all(np.isfinite(np.asarray(comps)))


def test_loss_no_targets_only_obj():
    loss_fn = ComputeLoss(FakeMeta(), dict(DEFAULT_HYP))
    total, comps = loss_fn(_preds(), _targets([[], []]))
    lbox, lobj, lcls = np.asarray(comps)
    assert lbox == 0 and lcls == 0 and lobj > 0


def test_loss_gradients_flow():
    loss_fn = ComputeLoss(FakeMeta(), dict(DEFAULT_HYP))
    t = _targets([[[1, 0.5, 0.5, 0.2, 0.3]]])

    def f(scale):
        preds = [p * scale for p in _preds()]
        return loss_fn(preds, t)[0]

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_loss_jits():
    loss_fn = ComputeLoss(FakeMeta(), dict(DEFAULT_HYP))
    t = _targets([[[1, 0.5, 0.5, 0.2, 0.3]]])
    preds = _preds()
    jitted = jax.jit(lambda p, tt: loss_fn(p, tt)[0])
    assert abs(float(jitted(preds, t)) - float(loss_fn(preds, t)[0])) < 1e-4


def test_nwd_option_changes_box_loss():
    hyp = dict(DEFAULT_HYP)
    hyp["nwdloss"] = 1
    loss_nwd = ComputeLoss(FakeMeta(), hyp)
    loss_std = ComputeLoss(FakeMeta(), dict(DEFAULT_HYP))
    preds = _preds()
    # box sized to pass the anchor ratio filter at level 0 (gwh ~ 1.2 cells)
    t = _targets([[[1, 0.5, 0.5, 0.15, 0.2]]])
    total_nwd = float(loss_nwd(preds, t)[0])
    total_std = float(loss_std(preds, t)[0])
    assert np.isfinite(total_nwd)
    assert total_nwd != pytest.approx(total_std)


def test_slide_modulation_weights():
    loss = jnp.ones((4,))
    targets = jnp.array([0.1, 0.45, 0.6, 1.0])
    out = np.asarray(slide_modulation(loss, targets, auto_iou=jnp.asarray(0.5)))
    assert out[0] == 1.0
    assert abs(out[1] - np.exp(0.5)) < 1e-5
    assert abs(out[2] - np.exp(0.4)) < 1e-5
    assert abs(out[3] - 1.0) < 1e-5


def test_focal_modulation_downweights_easy():
    logits = jnp.array([5.0, -5.0])
    targets = jnp.array([1.0, 1.0])
    base = bce_with_logits(logits, targets)
    mod = focal_modulation(base, logits, targets)
    assert float(mod[0] / base[0]) < float(mod[1] / base[1])


def test_repulsion_enabled_runs():
    loss_fn = ComputeLoss(FakeMeta(), dict(DEFAULT_HYP))
    loss_fn.rep = True
    preds = _preds()
    t = _targets([[[1, 0.5, 0.5, 0.2, 0.3], [2, 0.52, 0.52, 0.2, 0.3]]])
    total, _ = loss_fn(preds, t)
    assert np.isfinite(float(total))


def test_pad_targets_shapes():
    labs = [np.array([[1, 0.5, 0.5, 0.1, 0.1]]), np.zeros((0, 5))]
    out = pad_targets(labs, 4)
    assert out.shape == (2, 4, 5)
    assert out[0, 0, 0] == 1 and out[0, 1, 0] == -1
    assert (out[1, :, 0] == -1).all()


def test_loss_grads_finite_on_degenerate_targets():
    """The backward must stay finite for every malformed-target shape the
    static lattice can see: cls>=0 rows with zero w/h (the reference's
    dynamic ratio filter simply drops them, loss.py:229 — our lattice
    keeps the lanes, so validity must gate them), exact-zero height on an
    otherwise valid label, and cls=-1 padding."""
    import jax

    from yolosomi_tpu.losses import ComputeLoss
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import load_hyp

    hyp = load_hyp(None)
    cfg = {
        "nc": 5, "depth_multiple": 1.0, "width_multiple": 1.0, "anchors": 3,
        "backbone": [
            [-1, 1, "Conv", [8, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Detect", ["nc", "anchors"]]],
    }
    model, meta = build_model(cfg, nc=5)
    variables = init_model(model, meta, imgsz=64)
    loss_fn = ComputeLoss(meta, hyp)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    preds = [jax.lax.stop_gradient(p) for p in model.apply(variables, images, False)]

    base = np.zeros((2, 8, 5), np.float32)
    base[:, :, 0] = -1
    base[:, :2, 0] = rng.integers(0, 5, (2, 2))
    base[:, :2, 1:] = rng.uniform(0.3, 0.6, (2, 2, 4))

    cases = {"clean": base.copy()}
    t = base.copy(); t[:, 2:, 0] = 0  # zero rows with cls=0 (contract breach)
    cases["zero-wh rows cls=0"] = t
    t = base.copy(); t[0, 1, 3] = 0.0
    cases["valid label w=0"] = t
    t = base.copy(); t[0, 1, 4] = 0.0
    cases["valid label h=0"] = t

    for name, tgt in cases.items():
        g = jax.grad(lambda ps: loss_fn(ps, jnp.asarray(tgt))[0])(preds)
        ok = all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g))
        assert ok, f"non-finite grads for case: {name}"
