"""REST serving contract test (reference: utils/flask_rest_api/restapi.py).

Boots serve.Handler on an ephemeral port with a tiny model behind the
api.load AutoShape, POSTs an encoded image, and checks the JSON record
schema the reference's Flask API returns."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def server():
    import serve
    from yolosomi_tpu.api import load

    serve._MODEL = load("yolov5n", None, imgsz=128, conf=0.0001)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_detection_endpoint_schema(server):
    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    req = urllib.request.Request(
        f"{server}/v1/object-detection/model", data=enc.tobytes(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        records = json.loads(r.read())
    assert isinstance(records, list)
    if records:  # random init + tiny conf usually yields detections
        keys = set(records[0])
        assert {"xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"} <= keys


def test_bad_payload_400(server):
    req = urllib.request.Request(
        f"{server}/v1/object-detection/model", data=b"not an image", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised
