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


def _multipart_body(parts, boundary=b"BoUnDaRy123"):
    """parts: list of (name, filename, content_type, payload)."""
    out = b""
    for name, filename, ctype, payload in parts:
        out += b"--" + boundary + b"\r\n"
        disp = b'Content-Disposition: form-data; name="' + name + b'"'
        if filename:
            disp += b'; filename="' + filename + b'"'
        out += disp + b"\r\n"
        if ctype:
            out += b"Content-Type: " + ctype + b"\r\n"
        out += b"\r\n" + payload + b"\r\n"
    out += b"--" + boundary + b"--\r\n"
    return out, b"multipart/form-data; boundary=" + boundary


def test_multipart_upload(server):
    """curl -F style upload: the image is NOT the largest part (a text
    field is bigger), so only real RFC-2046 parsing finds it."""
    img = np.random.default_rng(1).integers(0, 255, (160, 160, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    body, ctype = _multipart_body(
        [
            (b"comment", None, None, b"x" * (len(enc.tobytes()) + 500)),
            (b"image", b"frame.jpg", b"image/jpeg", enc.tobytes()),
        ]
    )
    req = urllib.request.Request(
        f"{server}/v1/object-detection/model",
        data=body,
        headers={"Content-Type": ctype.decode()},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        records = json.loads(r.read())
    assert isinstance(records, list)


def test_multipart_garbage_400(server):
    req = urllib.request.Request(
        f"{server}/v1/object-detection/model",
        data=b"--nope\r\ntotal garbage",
        headers={"Content-Type": "multipart/form-data; boundary=other"},
        method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


def test_empty_body_400(server):
    req = urllib.request.Request(
        f"{server}/v1/object-detection/model", data=b"", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


def test_parse_multipart_image_unit():
    """Unit coverage of the parser without the server: filename-less image
    part, image part preferred over preceding fields."""
    import serve

    body, ctype = _multipart_body(
        [
            (b"meta", None, None, b"metadata-blob"),
            (b"file", None, b"image/png", b"PNGDATA"),
        ]
    )
    assert serve.parse_multipart_image(body, ctype.decode()) == b"PNGDATA"
    assert serve.parse_multipart_image(b"junk", "multipart/form-data; boundary=x") in (None, b"")
