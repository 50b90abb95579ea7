"""Reference-oracle parity, part 2: box geometry, augmentation RNG-exact
parity, soft-NMS, EMA decay, and the one-cycle schedule — the reference's
own code as golden (stubs installed by test_reference_oracle, which this
module imports for its dependency setup).

Oracles exercised (reference file:line):
  - box converter family xyxy2xywh/xywh2xyxy/xywhn2xyxy/xyxy2xywhn/xyn2xy
    + clip_coords/scale_coords (utils/general.py:532-627)
  - segment2box/segments2boxes/resample_segments (utils/general.py:578-600)
  - one_cycle cosine schedule (utils/general.py:462) and fitness weights
    (utils/metrics.py:15)
  - augment_hsv / hist_equalize / mixup / cutout / replicate under a shared
    RNG seed — our host pipeline draws the SAME random sequence in the SAME
    order, so outputs are bit-identical (utils/augmentations.py:48-311)
  - soft_nms keep set + decayed scores (utils/general.py:834-862)
  - ModelEMA ramped decay over parameters AND BatchNorm buffers
    (utils/torch_utils.py:315-349)
"""

import math
import random as pyrandom
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

# module-level side effects of the base oracle suite install the dependency
# stubs and put /root/reference on sys.path (skips at module level if the
# reference checkout is absent)
import test_reference_oracle  # noqa: F401,E402

try:
    import utils.augmentations as ref_aug  # noqa: E402
    import utils.general as ref_general  # noqa: E402
    import utils.metrics as ref_metrics  # noqa: E402
    import utils.torch_utils as ref_tu  # noqa: E402
except Exception as e:  # pragma: no cover - environment drift guard
    pytest.skip(f"reference import failed: {e!r}", allow_module_level=True)

from yolosomi_tpu.data import augment as our_aug  # noqa: E402
from yolosomi_tpu.engine.ema import ema_init, ema_update  # noqa: E402
from yolosomi_tpu.ops.nms import soft_nms_scores  # noqa: E402
from yolosomi_tpu.utils import boxes as our_boxes  # noqa: E402
from yolosomi_tpu.utils.general import one_cycle as our_one_cycle  # noqa: E402
from yolosomi_tpu.utils.metrics import fitness as our_fitness  # noqa: E402


# --------------------------------------------------------------------------
# box converters (general.py:532-627)
# --------------------------------------------------------------------------


def _rand_xyxy(rng, n=64, scale=600.0, jitter=40.0):
    xy = rng.uniform(0, scale, (n, 2))
    wh = rng.uniform(1, jitter, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


@pytest.mark.parametrize(
    "name,args",
    [
        ("xyxy2xywh", ()),
        ("xywh2xyxy", ()),
        ("xywhn2xyxy", (480, 352, 7, 11)),
        ("xyxy2xywhn", (480, 352)),
    ],
)
def test_box_converters_oracle(name, args):
    rng = np.random.default_rng(0)
    x = _rand_xyxy(rng)
    if name in ("xywh2xyxy",):
        x = np.abs(x)
    if name == "xywhn2xyxy":
        x = rng.uniform(0.05, 0.95, (64, 4)).astype(np.float32)
    ref = getattr(ref_general, name)(x.copy(), *args)
    ours = getattr(our_boxes, name)(x.copy(), *args)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-5)


def test_xyxy2xywhn_clip_oracle():
    rng = np.random.default_rng(1)
    x = _rand_xyxy(rng, scale=700.0)  # some boxes exceed the 640x480 canvas
    ref = ref_general.xyxy2xywhn(x.copy(), w=640, h=480, clip=True, eps=1e-3)
    ours = our_boxes.xyxy2xywhn(x.copy(), w=640, h=480, clip=True, eps=1e-3)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-5)


def test_xyn2xy_oracle():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, (40, 2)).astype(np.float32)
    ref = ref_general.xyn2xy(pts.copy(), w=512, h=288, padw=3, padh=9)
    ours = our_boxes.xyn2xy(pts.copy(), w=512, h=288, padw=3, padh=9)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-5)


def test_clip_scale_coords_oracle():
    rng = np.random.default_rng(3)
    coords = _rand_xyxy(rng, scale=700.0)
    ref_c = coords.copy()
    ref_general.clip_coords(ref_c, (480, 640))  # mutates in place, returns None
    ours = our_boxes.clip_coords(coords.copy(), (480, 640))
    np.testing.assert_allclose(np.asarray(ours), ref_c, atol=1e-5)

    for ratio_pad in (None, ((0.75, 0.75), (8.0, 12.0))):
        c = _rand_xyxy(rng, scale=600.0)
        ref_c = c.copy()
        ref_general.scale_coords((640, 640), ref_c, (1080, 1920), ratio_pad)  # in-place
        ours_c = our_boxes.scale_coords((640, 640), c.copy(), (1080, 1920), ratio_pad)
        np.testing.assert_allclose(np.asarray(ours_c), ref_c, rtol=1e-5, atol=1e-4)


def test_segment_helpers_oracle():
    rng = np.random.default_rng(4)
    segs = [rng.uniform(-30, 700, (m, 2)).astype(np.float32) for m in (5, 9, 17)]
    for s in segs:
        np.testing.assert_allclose(
            our_boxes.segment2box(s.copy(), 640, 480),
            ref_general.segment2box(s.copy(), 640, 480),
            rtol=1e-6,
        )
    np.testing.assert_allclose(
        our_boxes.segments2boxes([s.copy() for s in segs]),
        ref_general.segments2boxes([s.copy() for s in segs]),
        rtol=1e-6,
    )
    ours_r = our_boxes.resample_segments([s.copy() for s in segs], n=50)
    ref_r = ref_general.resample_segments([s.copy() for s in segs], n=50)
    for a, b in zip(ours_r, ref_r):
        np.testing.assert_allclose(a, b, rtol=1e-6)


# --------------------------------------------------------------------------
# schedules / fitness (general.py:462, metrics.py:15)
# --------------------------------------------------------------------------


def test_one_cycle_oracle():
    ref_lf = ref_general.one_cycle(1.0, 0.12, 280)
    our_lf = our_one_cycle(1.0, 0.12, 280)
    for x in (0, 1, 7, 140, 279, 280):
        assert math.isclose(our_lf(x), ref_lf(x), rel_tol=1e-9)


def test_fitness_oracle():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (3, 7)).astype(np.float32)
    ref = ref_metrics.fitness(x)  # (n,) row-wise; ours scores one result row
    for i in range(len(x)):
        assert math.isclose(our_fitness(x[i]), float(ref[i]), rel_tol=1e-6)


# --------------------------------------------------------------------------
# RNG-exact augmentation parity (augmentations.py:48-311)
# --------------------------------------------------------------------------


def _rand_im(rng, h=96, w=128):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8).astype(np.uint8)


def test_augment_hsv_oracle():
    rng = np.random.default_rng(6)
    im = _rand_im(rng)
    ref_im = im.copy()
    np.random.seed(77)
    ref_aug.augment_hsv(ref_im, 0.015, 0.7, 0.4)  # in-place
    np.random.seed(77)
    ours = our_aug.augment_hsv(im.copy(), 0.015, 0.7, 0.4)
    assert (ours == ref_im).all()


@pytest.mark.parametrize("clahe,bgr", [(True, False), (False, False), (True, True)])
def test_hist_equalize_oracle(clahe, bgr):
    rng = np.random.default_rng(7)
    im = _rand_im(rng)
    ref = ref_aug.hist_equalize(im.copy(), clahe=clahe, bgr=bgr)
    ours = our_aug.hist_equalize(im.copy(), clahe=clahe, bgr=bgr)
    assert (ours == ref).all()


def test_mixup_oracle():
    rng = np.random.default_rng(8)
    im1, im2 = _rand_im(rng), _rand_im(rng)
    l1 = np.array([[0, 1, 2, 20, 30]], np.float32)
    l2 = np.array([[1, 5, 6, 25, 35]], np.float32)
    np.random.seed(9)
    ref_im, ref_l = ref_aug.mixup(im1.copy(), l1.copy(), im2.copy(), l2.copy())
    np.random.seed(9)
    our_im, our_l = our_aug.mixup(im1.copy(), l1.copy(), im2.copy(), l2.copy())
    assert (our_im == ref_im).all()
    np.testing.assert_allclose(our_l, ref_l)


def test_cutout_oracle():
    rng = np.random.default_rng(10)
    im = _rand_im(rng, 160, 160)
    labels = np.concatenate(
        [rng.integers(0, 3, (12, 1)), _rand_xyxy(rng, 12, scale=120.0, jitter=30.0)], 1
    ).astype(np.float32)
    ref_im = im.copy()
    pyrandom.seed(123)
    ref_labels = ref_aug.cutout(ref_im, labels.copy(), p=1.0)  # im modified in place
    pyrandom.seed(123)
    our_im, our_labels = our_aug.cutout(im.copy(), labels.copy(), p=1.0)
    assert (our_im == ref_im).all()
    np.testing.assert_allclose(our_labels, ref_labels)


def test_replicate_oracle():
    rng = np.random.default_rng(11)
    im = _rand_im(rng, 128, 128)
    labels = np.concatenate(
        [rng.integers(0, 3, (6, 1)), _rand_xyxy(rng, 6, scale=90.0, jitter=25.0)], 1
    ).astype(np.float32)
    pyrandom.seed(321)
    ref_im, ref_labels = ref_aug.replicate(im.copy(), labels.copy())
    pyrandom.seed(321)
    our_im, our_labels = our_aug.replicate(im.copy(), labels.copy())
    assert (our_im == ref_im).all()
    np.testing.assert_allclose(our_labels, ref_labels)


# --------------------------------------------------------------------------
# soft-NMS (general.py:834-862)
# --------------------------------------------------------------------------


def test_soft_nms_oracle():
    rng = np.random.default_rng(12)
    # clustered boxes so decay actually fires
    centers = rng.uniform(40, 200, (6, 2))
    boxes, scores = [], []
    for cx, cy in centers:
        for _ in range(4):
            dx, dy = rng.uniform(-6, 6, 2)
            w, h = rng.uniform(18, 30, 2)
            boxes.append([cx + dx - w / 2, cy + dy - h / 2, cx + dx + w / 2, cy + dy + h / 2])
            scores.append(rng.uniform(0.3, 1.0))
    boxes = np.array(boxes, np.float32)
    scores = np.array(scores, np.float32)
    order = np.argsort(-scores)  # the reference assumes score-sorted input
    boxes, scores = boxes[order], scores[order]

    t_boxes = torch.tensor(boxes)
    t_scores = torch.tensor(scores)  # mutated in place by the reference
    keep = ref_general.soft_nms(t_boxes, t_scores, iou_thresh=0.3, sigma=0.5, score_threshold=0.25)
    ref_keep = sorted(int(i) for i in keep)

    final = np.asarray(soft_nms_scores(boxes, scores, sigma=0.5, max_det=len(boxes), iou_thresh=0.3))
    our_keep = sorted(np.where(final > 0.25)[0].tolist())

    # the reference's `while order.numel() > 1` drops the final survivor,
    # so our keep set may exceed it by at most that one box
    assert set(ref_keep) <= set(our_keep)
    assert len(our_keep) - len(ref_keep) <= 1
    # decayed selection-time scores must agree on the common keep set
    np.testing.assert_allclose(
        final[ref_keep], t_scores.numpy()[ref_keep], rtol=2e-3, atol=1e-4
    )


# --------------------------------------------------------------------------
# ModelEMA ramped decay (torch_utils.py:315-349)
# --------------------------------------------------------------------------


def test_model_ema_oracle():
    torch.manual_seed(0)
    model = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.BatchNorm2d(4))
    # give the BN running stats non-trivial values
    model[1].running_mean.normal_()
    model[1].running_var.uniform_(0.5, 2.0)

    ref_ema = ref_tu.ModelEMA(model, decay=0.9999)

    def tree_of(m):
        return {k: v.detach().numpy().copy() for k, v in m.state_dict().items() if v.dtype.is_floating_point}

    state = ema_init(tree_of(model))
    for step in range(5):
        torch.manual_seed(step + 1)
        for p in model.parameters():
            p.data.normal_()
        model[1].running_mean.normal_()
        ref_ema.update(model)
        state = ema_update(state, tree_of(model), decay=0.9999, tau=2000.0)

    ref_sd = {k: v.numpy() for k, v in ref_ema.ema.state_dict().items() if v.dtype.is_floating_point}
    for k, ours in state.variables.items():
        np.testing.assert_allclose(np.asarray(ours), ref_sd[k], rtol=1e-5, atol=1e-6)
