"""Task-aligned assigner + anchor-free (v8/v11) loss tests
(spec: the published TAL the reference imports via ultralytics for its
DFL heads, yolo.py:725-922).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from yolosomi_tpu.losses import pad_targets
from yolosomi_tpu.losses_v8 import (
    ComputeLossV8,
    bbox2dist,
    dist2bbox,
    make_anchor_points,
    task_aligned_assign,
)


class _Meta:
    nc = 4
    nl = 3
    strides = (8.0, 16.0, 32.0)


def test_anchor_points():
    pts, strs = make_anchor_points([(4, 4), (2, 2)], (8, 16))
    assert pts.shape == (20, 2) and strs.shape == (20,)
    assert float(pts[0, 0]) == 0.5 and float(strs[16]) == 16.0


def test_dist_bbox_roundtrip():
    ap = jnp.array([[4.0, 4.0], [7.0, 2.0]])
    box = jnp.array([[2.0, 1.0, 9.0, 6.0], [5.0, 1.0, 9.0, 3.0]])
    d = bbox2dist(box, ap, 16)
    back = dist2bbox(d, ap)
    np.testing.assert_allclose(np.asarray(back), np.asarray(box), atol=1e-5)


def test_assigner_basic():
    ap, strs = make_anchor_points([(8, 8)], (8,))
    anc_px = ap * strs[:, None]
    # predictions: boxes centered at anchors, confident on class 1
    pd_scores = jnp.full((1, 64, 4), 0.5)
    pd_boxes = jnp.concatenate([anc_px - 16, anc_px + 16], -1)[None]
    gt_labels = jnp.array([[1, -1]])
    gt_boxes = jnp.array([[[8.0, 8.0, 40.0, 40.0], [0, 0, 0, 0]]])
    tl, tb, ts, fg = task_aligned_assign(pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes)
    n_fg = int(fg.sum())
    assert 0 < n_fg <= 10
    assert (np.asarray(tl)[np.asarray(fg)] == 1).all()
    # assigned target boxes are the gt box
    tb_fg = np.asarray(tb)[np.asarray(fg)]
    np.testing.assert_allclose(tb_fg, np.tile([8, 8, 40, 40], (n_fg, 1)), atol=1e-5)
    # padded gt row contributed nothing
    assert float(ts.sum()) > 0


def test_assigner_conflict_resolution():
    """An anchor inside two gts goes to the higher-IoU one."""
    ap, strs = make_anchor_points([(4, 4)], (8,))
    anc_px = ap * strs[:, None]
    pd_scores = jnp.full((1, 16, 4), 0.9)
    # predicted boxes match gt0 exactly
    gt0 = jnp.array([0.0, 0.0, 32.0, 32.0])
    pd_boxes = jnp.tile(gt0, (1, 16, 1))
    gt_labels = jnp.array([[0, 2]])
    gt_boxes = jnp.stack([gt0, jnp.array([0.0, 0.0, 30.0, 30.0])])[None]
    tl, tb, ts, fg = task_aligned_assign(pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes)
    lab = np.asarray(tl)[np.asarray(fg)]
    assert (lab == 0).all(), "shared anchors must resolve to the higher-IoU gt"


def test_loss_finite_and_grads():
    loss = ComputeLossV8(_Meta, {})
    rng = np.random.default_rng(0)
    B, sz = 2, 64
    preds = [
        jnp.asarray(rng.standard_normal((B, sz // int(s), sz // int(s), 68)) * 0.1, jnp.float32)
        for s in _Meta.strides
    ]
    labels = [
        np.array([[1, 0.5, 0.5, 0.6, 0.7], [2, 0.2, 0.3, 0.3, 0.3]], np.float32),
        np.array([[0, 0.6, 0.6, 0.5, 0.5]], np.float32),
    ]
    targets = jnp.asarray(pad_targets(labels, 8))
    total, comps = jax.jit(loss)(preds, targets)
    assert np.isfinite(float(total))
    g = jax.grad(lambda ps: loss(ps, targets)[0])(preds)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


def test_v8_overfit_raw_maps():
    """Direct optimization of raw head maps on one target: the loss must
    drive box/cls components down (end-to-end trainability of the
    anchor-free path; VERDICT r1 item 4)."""
    loss_fn = ComputeLossV8(_Meta, {})
    rng = np.random.default_rng(1)
    sz = 64
    preds = [
        jnp.asarray(rng.standard_normal((1, sz // int(s), sz // int(s), 68)) * 0.1, jnp.float32)
        for s in _Meta.strides
    ]
    targets = jnp.asarray(pad_targets([np.array([[2, 0.5, 0.5, 0.5, 0.5]], np.float32)], 8))

    opt = optax.adam(0.05)
    state = opt.init(preds)

    @jax.jit
    def step(preds, state):
        (l, comps), g = jax.value_and_grad(lambda p: loss_fn(p, targets), has_aux=True)(preds)
        updates, state = opt.update(g, state)
        return optax.apply_updates(preds, updates), state, l, comps

    first = None
    for i in range(150):
        preds, state, l, comps = step(preds, state)
        if first is None:
            first = float(l)
    final = float(l)
    assert final < first * 0.2, f"v8 loss did not optimize: {first} -> {final}"
    assert float(comps[0]) < 1.0  # box component near zero when fit
