"""Dataset converter + WBF CLI tests (spec: reference root converters)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def visdrone_dir(tmp_path):
    d = tmp_path / "VisDrone2019-DET-val"
    (d / "images").mkdir(parents=True)
    (d / "annotations").mkdir()
    Image.new("RGB", (200, 100)).save(d / "images" / "a.jpg")
    # x,y,w,h,score,cat,trunc,occ ; one valid, one ignored (score 0), one bad cat
    (d / "annotations" / "a.txt").write_text("10,20,40,30,1,3,0,0\n5,5,10,10,0,1,0,0\n1,1,5,5,1,11,0,0\n")
    return d


def test_visdrone2yolo(visdrone_dir):
    sys.path.insert(0, str(REPO / "tools"))
    import visdrone2yolo

    visdrone2yolo.convert(visdrone_dir)
    out = (visdrone_dir / "labels" / "a.txt").read_text().strip().splitlines()
    assert len(out) == 1  # ignored + bad category rows dropped
    parts = out[0].split()
    assert parts[0] == "2"  # category 3 -> class 2
    np.testing.assert_allclose(float(parts[1]), (10 + 20) / 200, atol=1e-5)
    np.testing.assert_allclose(float(parts[2]), (20 + 15) / 100, atol=1e-5)


def test_yolo2voc_and_voc2coco(tmp_path, visdrone_dir):
    sys.path.insert(0, str(REPO / "tools"))
    import visdrone2yolo

    visdrone2yolo.convert(visdrone_dir)
    xml_dir = tmp_path / "xml"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "yolo2voc.py"), "--images", str(visdrone_dir / "images"),
         "--labels", str(visdrone_dir / "labels"), "--out", str(xml_dir), "--names", "a", "b", "c"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert (xml_dir / "a.xml").exists()

    out_json = tmp_path / "coco.json"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "voc2coco.py"), "--xml", str(xml_dir), "--out", str(out_json)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    import json

    coco = json.loads(out_json.read_text())
    assert len(coco["images"]) == 1 and len(coco["annotations"]) == 1
    bb = coco["annotations"][0]["bbox"]
    np.testing.assert_allclose(bb, [10, 20, 40, 30], atol=1.5)


def test_wbf_cli(tmp_path):
    d1 = tmp_path / "m1"
    d2 = tmp_path / "m2"
    out = tmp_path / "fused"
    d1.mkdir()
    d2.mkdir()
    (d1 / "img.txt").write_text("1 0.2 0.2 0.2 0.2 0.9\n")
    (d2 / "img.txt").write_text("1 0.21 0.2 0.2 0.2 0.8\n1 0.8 0.8 0.1 0.1 0.7\n")
    r = subprocess.run(
        [sys.executable, str(REPO / "wbf.py"), "--dirs", str(d1), str(d2), "--out", str(out)],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr
    rows = (out / "img.txt").read_text().strip().splitlines()
    assert len(rows) == 2  # overlapping pair fused, lone box kept
    confs = sorted(float(r.split()[5]) for r in rows)
    assert confs[0] == pytest.approx(0.35, abs=1e-3)  # lone box halved (1/2 models)
    assert confs[1] > 0.8


def test_downloads_local_paths(tmp_path):
    """attempt_download local fast-path + is_url + unzip handling
    (reference: utils/downloads.py; network paths degrade to clear errors
    on this zero-egress image)."""
    import shutil

    import pytest

    from yolosomi_tpu.utils.downloads import attempt_download, download, is_url

    f = tmp_path / "w.msgpack"
    f.write_bytes(b"x" * 100)
    assert attempt_download(f) == f
    assert is_url("https://host/w.pt") and not is_url("w.pt")
    with pytest.raises(FileNotFoundError):
        attempt_download(tmp_path / "missing.pt")

    # download() with an already-present zip: skips fetch, unzips
    src = tmp_path / "payload"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    zp = shutil.make_archive(str(tmp_path / "d" / "pack"), "zip", src)
    out = download([f"https://host/{Path(zp).name}"], dir=tmp_path / "d")
    assert (tmp_path / "d" / "a.txt").read_text() == "hello"
    assert out[0].name == "pack.zip"
