"""Device-cache mosaic path (--cache device, ops/mosaic_device.py).

Oracle strategy: the host pipeline (load_mosaic + cv2.warpAffine,
reference datasets.py:732-798 + augmentations.py:125-212) is the golden
producer. Labels must match BIT-EXACTLY (the plan replays the same draw
sequence through the same numpy geometry); pixels must match everywhere
except the 1-px tile-seam band (the device warp samples each source tile
directly instead of materializing the 2Sx2S canvas, so only the
cross-seam bilinear blend differs).
"""

import random

import numpy as np
import cv2
import pytest
import jax.numpy as jnp

from yolosomi_tpu.data.augment import perspective_params
from yolosomi_tpu.data.datasets import DataLoader, DetectionDataset, collate_plan_batch
from yolosomi_tpu.ops.mosaic_device import build_device_cache, mosaic_mixup_batch

DATA = "datasets/shapes/train/images"
if not __import__("os").path.isdir(DATA):  # generate the fixture dataset
    import tempfile

    from tools.make_shapes_dataset import main as _make_shapes

    _root = tempfile.mkdtemp(prefix="shapes_")
    _make_shapes(["--out", _root, "--n", "12", "--val-n", "2"])
    DATA = f"{_root}/train/images"
HYP = {
    "mosaic": 1.0, "mixup": 0.0, "copy_paste": 0.0,
    "degrees": 5.0, "translate": 0.1, "scale": 0.4, "shear": 2.0, "perspective": 0.0,
    "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "fliplr": 0.0, "flipud": 0.0,
}


def _dataset(img_size=128, hyp=None):
    return DetectionDataset(
        DATA, img_size=img_size, batch_size=4, augment=True,
        hyp=dict(HYP, **(hyp or {})), rect=False, stride=32, max_labels=64,
    )


def _plan_to_batch(plan):
    return {k: np.asarray(v)[None] for k, v in plan.items()}


def test_letterbox_tile_matches_cv2_warp():
    """Single-tile composite == paste-into-canvas + cv2.warpAffine."""
    rng = np.random.default_rng(3)
    S = 96
    h, w = 70, 96
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    slab = np.full((1, S, S, 3), 114, np.uint8)
    slab[0, :h, :w] = img

    random.seed(11)
    M, s, width, height = perspective_params(S, S, degrees=8, translate=0.1, scale=0.3, shear=3)
    left, top = 0, (S - h) // 2

    canvas = np.full((S, S, 3), 114, np.uint8)
    canvas[top : top + h, left : left + w] = img
    want = cv2.warpAffine(canvas, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    offs = np.zeros((4, 2), np.float32)
    offs[0] = (left, top)
    srect = np.zeros((4, 4), np.float32)
    srect[0] = (0, 0, w, h)
    plan = {
        "idx": np.stack([np.zeros(4, np.int32)] * 2, 0),
        "center": np.stack([np.asarray([1e9, 1e9], np.float32)] * 2, 0),
        "offs": np.stack([offs] * 2, 0),
        "srect": np.stack([srect] * 2, 0),
        "minv": np.stack([np.linalg.inv(M).astype(np.float32)] * 2, 0),
        "mixw": np.float32(1.0),
    }
    got = np.asarray(mosaic_mixup_batch(jnp.asarray(slab), _plan_to_batch(plan), S))[0] * 255.0
    # cv2 uses 5-bit fixed-point bilinear weights; allow small rounding
    diff = np.abs(got - want.astype(np.float32))
    assert np.median(diff) <= 1.0
    assert (diff > 4.0).mean() < 0.01, f"pixels off: {(diff > 4.0).mean():.4f}"


def test_mosaic_plan_labels_match_host_exactly():
    """plan_item replays load_mosaic's draw order: identical labels."""
    ds = _dataset()
    for seed in (0, 1, 7):
        random.seed(seed)
        np.random.seed(seed)
        img_host, labels_host = ds.load_mosaic(2)
        random.seed(seed)
        np.random.seed(seed)
        idx4, center, offs, srect, minv, labels_plan = ds._plan_mosaic(2)
        np.testing.assert_allclose(labels_plan, labels_host, rtol=0, atol=0)


def test_mosaic_pixels_match_host_off_seams():
    ds = _dataset()
    slab, hw = build_device_cache(ds)
    S = ds.img_size
    random.seed(5)
    np.random.seed(5)
    img_host, _ = ds.load_mosaic(0)
    random.seed(5)
    np.random.seed(5)
    idx4, center, offs, srect, minv, _ = ds._plan_mosaic(0)
    plan = {
        "idx": np.stack([idx4] * 2, 0), "center": np.stack([center] * 2, 0),
        "offs": np.stack([offs] * 2, 0), "srect": np.stack([srect] * 2, 0),
        "minv": np.stack([minv] * 2, 0), "mixw": np.float32(1.0),
    }
    got = np.asarray(mosaic_mixup_batch(jnp.asarray(slab), _plan_to_batch(plan), S))[0] * 255.0
    diff = np.abs(got - img_host.astype(np.float32))
    # seams + fixed-point rounding: demand bulk agreement, tiny median
    assert np.median(diff) <= 1.0
    assert (diff > 4.0).mean() < 0.02, f"pixels off: {(diff > 4.0).mean():.4f}"


def test_letterbox_plan_handles_truncated_resize(tmp_path):
    """load_image's int() truncation can leave the long side at S-1; the
    plan folds the letterbox ratio into the matrix so device pixels stay
    aligned with the (bit-exact) labels. Oracle: the host __getitem__
    pixels for the same (mosaic-off, identity-perspective) settings."""
    S = 128
    rng = np.random.default_rng(4)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    # w0=161 -> r=128/161 -> int(161*r)=127 != 128 (truncates)
    im = rng.integers(0, 255, (120, 161, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a.jpg"), im)
    (tmp_path / "labels" / "a.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    hyp = dict(HYP, mosaic=0.0, degrees=0.0, translate=0.0, scale=0.0, shear=0.0)
    ds = DetectionDataset(
        str(tmp_path / "images"), img_size=S, batch_size=1, augment=True,
        hyp=hyp, rect=False, stride=32, max_labels=8,
    )
    assert ds.resized_hw(0)[1] == 127  # the truncation case under test

    random.seed(0)
    np.random.seed(0)
    img_host, labels_host, _, _ = ds[0]
    random.seed(0)
    np.random.seed(0)
    plan, labels_plan, _, _ = ds.plan_item(0)
    np.testing.assert_allclose(labels_plan, labels_host, atol=1e-6)

    slab, _ = build_device_cache(ds)
    got = np.asarray(mosaic_mixup_batch(jnp.asarray(slab), _plan_to_batch(plan), S))[0] * 255.0
    diff = np.abs(got - img_host.astype(np.float32))
    assert np.median(diff) <= 1.5
    assert (diff > 6.0).mean() < 0.02, f"pixels off: {(diff > 6.0).mean():.4f}"


def test_tiles_first_gather_equals_flat_taps():
    """The tiles-first lowering (contiguous per-sample tile gather +
    small-table taps) == the flat global-table taps."""
    from yolosomi_tpu.ops.mosaic_device import _composite_single

    ds = _dataset()
    slab, _ = build_device_cache(ds)
    S = ds.img_size
    random.seed(9)
    np.random.seed(9)
    idx4, center, offs, srect, minv, _ = ds._plan_mosaic(1)
    cache_flat = jnp.asarray(slab).reshape(-1, 3)
    args = (
        jnp.asarray(idx4)[None], jnp.asarray(minv)[None], jnp.asarray(center)[None],
        jnp.asarray(offs)[None], jnp.asarray(srect)[None],
    )
    a = np.asarray(_composite_single(cache_flat, S, *args, S, tiles_first=False))
    b = np.asarray(_composite_single(cache_flat, S, *args, S, tiles_first=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-3)


def test_plan_item_mixup_concats_labels_and_weights():
    ds = _dataset(hyp={"mixup": 1.0})
    random.seed(0)
    np.random.seed(0)
    plan, labels, path, shapes = ds.plan_item(1)
    assert 0.0 < float(plan["mixw"]) < 1.0
    assert plan["idx"].shape == (2, 4) and plan["minv"].shape == (2, 3, 3)
    assert not np.array_equal(plan["idx"][0], plan["idx"][1]) or not np.allclose(
        plan["minv"][0], plan["minv"][1]
    )
    assert shapes is None and len(labels) >= 0


def test_plan_loader_collates_and_device_builds_batch():
    ds = _dataset(hyp={"mixup": 0.5})
    dl = DataLoader(ds, 4, shuffle=True, plan=True, prefetch=0)
    plan, targets, paths, shapes = next(iter(dl))
    assert plan["idx"].shape == (4, 2, 4) and plan["mixw"].shape == (4,)
    assert targets.shape == (4, 64, 5)
    slab, _ = build_device_cache(ds)
    out = np.asarray(mosaic_mixup_batch(jnp.asarray(slab), plan, ds.img_size))
    assert out.shape == (4, ds.img_size, ds.img_size, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()
    # content present (not all fill)
    assert (np.abs(out - 114 / 255.0) > 0.05).mean() > 0.05


def test_plan_loader_honors_image_weights():
    """--image-weights sampling flows through plan mode (the idx draw is
    shared loader code, but pin it: a one-hot weight must make every
    mosaic's FIRST tile that image)."""
    ds = _dataset()
    dl = DataLoader(ds, 4, shuffle=True, plan=True, prefetch=0)
    w = np.zeros(len(ds))
    w[3] = 1.0
    dl.sample_weights = w
    plan, targets, paths, _ = next(iter(dl))
    # base index of every sample is image 3 (mosaic shuffles tile order,
    # so check membership of 3 in each sample's first composite)
    assert all(3 in plan["idx"][b, 0] for b in range(4))


def test_train_step_device_mosaic_runs_and_is_finite():
    """make_train_step(device_mosaic=...) end-to-end on a tiny graph."""
    import jax

    from yolosomi_tpu.engine.optim import make_optimizer
    from yolosomi_tpu.engine.trainer import create_train_state, make_train_step
    from yolosomi_tpu.losses import ComputeLoss
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import DEFAULT_HYP, find_config, load_model_cfg

    hyp = dict(DEFAULT_HYP)
    cfg = load_model_cfg(find_config("yolov5n"))
    model, meta = build_model(cfg, nc=3)
    variables = init_model(model, meta, imgsz=128)
    loss_fn = ComputeLoss(meta, hyp)
    optimizer = make_optimizer(hyp, nb=4, epochs=2, batch_size=4)
    state = create_train_state(dict(variables), optimizer)
    step = make_train_step(
        model, loss_fn, optimizer, device_preprocess=dict(hyp, seed=0), device_mosaic=128
    )

    ds = _dataset()
    slab, _ = build_device_cache(ds)
    dl = DataLoader(ds, 4, shuffle=True, plan=True, prefetch=0)
    plan, targets, _, _ = next(iter(dl))
    state, metrics = step(state, (jnp.asarray(slab), plan), jnp.asarray(targets))
    assert np.isfinite(float(metrics["loss"]))
    assert bool(metrics["grads_finite"])
