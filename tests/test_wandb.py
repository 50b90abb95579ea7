"""W&B artifact plane (utils/wandb_utils.py) against a stub wandb module —
the package is absent from this image (the reference gates on the import
too, wandb_utils.py:18-25), so the stub verifies the artifact protocol:
what gets added to artifacts, the aliases, the resume resolution, and the
bbox panel payloads."""

import json
import types
from pathlib import Path

import numpy as np
import pytest

import yolosomi_tpu.utils.wandb_utils as wu


class _FakeArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata or {}
        self.files, self.dirs, self.objs = [], [], {}

    def add_file(self, path, name=None):
        self.files.append((path, name))

    def add_dir(self, path, name=None):
        self.dirs.append((path, name))

    def add(self, obj, name):
        self.objs[name] = obj


class _FakeTable:
    def __init__(self, columns):
        self.columns, self.rows = columns, []

    def add_data(self, *row):
        self.rows.append(row)


class _FakeImage:
    def __init__(self, data, boxes=None, caption=None):
        self.data, self.boxes, self.caption = data, boxes, caption


class _FakeRun:
    def __init__(self):
        self.id = "fake01"
        self.logged_artifacts = []
        self.logged = []
        self.artifact_store = {}

    def log_artifact(self, art, aliases=None):
        self.logged_artifacts.append((art, aliases or []))

    def log(self, payload, step=None):
        self.logged.append((payload, step))

    def use_artifact(self, ref):
        return self.artifact_store[ref]

    def finish(self):
        pass


class _DownloadableArtifact:
    def __init__(self, root, metadata=None):
        self.root, self.metadata = root, metadata or {}

    def download(self, root=None):
        return str(self.root)


@pytest.fixture()
def fake_wandb(monkeypatch):
    run = _FakeRun()
    mod = types.SimpleNamespace(
        run=None,
        init=lambda **kw: run,
        Artifact=_FakeArtifact,
        Table=_FakeTable,
        Image=_FakeImage,
    )
    monkeypatch.setattr(wu, "wandb", mod)
    return run


def test_noop_without_wandb(monkeypatch, tmp_path):
    monkeypatch.setattr(wu, "wandb", None)
    wb = wu.WandbLogger()
    assert wb.run is None
    # every method is safe to call unconditionally
    wb.log_checkpoint(tmp_path / "x.msgpack", 0, 0.0)
    wb.log_dataset({"nc": 1, "names": ["a"]})
    wb.log_val_image(np.zeros((4, 4, 3), np.uint8), np.zeros((0, 6)), ["a"])
    wb.end_epoch({"m": 1.0}, 0)
    wb.finish()


def test_checkpoint_artifact_aliases(fake_wandb, tmp_path):
    ckpt = tmp_path / "best.msgpack"
    ckpt.write_bytes(b"x")
    wb = wu.WandbLogger()
    wb.log_checkpoint(ckpt, epoch=7, fitness=0.42, best=True)
    (art, aliases), = fake_wandb.logged_artifacts
    assert art.type == "model"
    assert art.metadata == {"epoch": 7, "fitness": 0.42, "best": True}
    assert art.files == [(str(ckpt), "best.msgpack")]
    assert aliases == ["latest", "epoch7", "best"]


def test_resume_from_artifact(fake_wandb, tmp_path):
    (tmp_path / "last.msgpack").write_bytes(b"x")
    fake_wandb.artifact_store["ent/proj/run_x_model:best"] = _DownloadableArtifact(
        tmp_path, metadata={"epoch": 3, "fitness": 0.5}
    )
    wb = wu.WandbLogger()
    got = wb.resume_checkpoint("wandb-artifact://ent/proj/run_x_model:best")
    assert got == str(tmp_path / "last.msgpack")
    # non-artifact paths resolve to None (caller keeps the local path)
    assert wb.resume_checkpoint("weights/last.ckpt") is None


def test_dataset_artifact_table(fake_wandb, tmp_path):
    import cv2

    img_dir = tmp_path / "train" / "images"
    lbl_dir = tmp_path / "train" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((8, 8, 3), np.uint8))
    (lbl_dir / "a.txt").write_text("1 0.5 0.5 0.25 0.25\n")
    wb = wu.WandbLogger()
    wb.log_dataset({"train": str(img_dir), "nc": 2, "names": ["x", "y"]})
    (art, _), = fake_wandb.logged_artifacts
    assert art.type == "dataset"
    assert (str(img_dir), "train/images") in art.dirs
    assert (str(lbl_dir), "train/labels") in art.dirs
    table = art.objs["table"]
    assert len(table.rows) == 1
    _id, image, classes = table.rows[0]
    box, = image.boxes["ground_truth"]["box_data"]
    assert box["class_id"] == 1 and box["box_caption"] == "y"
    assert box["position"]["middle"] == [0.5, 0.5]
    assert json.loads(classes) == [1]


def test_val_bbox_panel_and_epoch_flush(fake_wandb):
    wb = wu.WandbLogger()
    im = np.zeros((100, 200, 3), np.uint8)
    dets = np.array([[20, 10, 60, 50, 0.9, 0], [0, 0, 10, 10, 0.1, 1]], np.float32)
    wb.log_val_image(im, dets, names=["cat", "dog"], path="img0.jpg")
    wb.end_epoch({"metrics/fitness": 0.3}, step=2)
    (payload, step), = fake_wandb.logged
    assert step == 2 and payload["metrics/fitness"] == 0.3
    panel, = payload["val/bounding_boxes"]
    # only the above-threshold box survives, normalized to percentage
    box, = panel.boxes["predictions"]["box_data"]
    assert box["class_id"] == 0 and box["box_caption"].startswith("cat 0.90")
    assert box["position"] == {"minX": 0.1, "minY": 0.1, "maxX": 0.3, "maxY": 0.5}
    # queue drained after flush
    wb.end_epoch({}, step=3)
    assert len(fake_wandb.logged) == 1
