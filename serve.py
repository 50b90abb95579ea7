"""REST detection server (counterpart of reference utils/flask_rest_api/).

Same contract as the reference's Flask app (restapi.py:13-37):
POST an image to /v1/object-detection/<model> and get JSON records
[{xmin, ymin, xmax, ymax, confidence, class, name}, ...]. Implemented on
the stdlib http.server (flask is not bundled in this image; the stdlib
threaded server also avoids the reference's debug-server deployment).

Usage:
    python serve.py --cfg yolo-somi --weights somi.msgpack --port 5000
    curl -X POST -T drone.jpg http://localhost:5000/v1/object-detection/somi
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import queue
import threading

from yolosomi_tpu.utils.general import LOGGER

_MODEL = None  # AutoShape, set in main()

# Single dedicated inference thread: ThreadingHTTPServer spawns a fresh
# thread per request, and dispatching jitted jax programs from many
# ephemeral threads segfaults after a few requests (reproduced on the CPU
# backend too). A worker queue serializes device access — also the right
# serving shape: one compiled program, requests pipelined through it.
_JOBS: "queue.Queue" = queue.Queue()
_WORKER_LOCK = threading.Lock()
_WORKER: threading.Thread | None = None


def _worker_loop():
    while True:
        img, out = _JOBS.get()
        try:
            results = _MODEL(img)
            out["records"] = results.pandas()[0].to_dict(orient="records")
        except Exception as e:  # noqa: BLE001 - surfaced as HTTP 500
            out["error"] = str(e)
        finally:
            out["done"].set()


def infer(img):
    """Run one image through the model on the dedicated worker thread."""
    global _WORKER
    with _WORKER_LOCK:
        if _WORKER is None or not _WORKER.is_alive():
            _WORKER = threading.Thread(target=_worker_loop, daemon=True)
            _WORKER.start()
    out = {"done": threading.Event()}
    _JOBS.put((img, out))
    out["done"].wait()
    if "error" in out:
        raise RuntimeError(out["error"])
    return out["records"]


def parse_multipart_image(raw: bytes, content_type: str):
    """Extract the uploaded file from a multipart/form-data body.

    Proper RFC-2046 parsing via the stdlib email parser (the declared
    boundary, per-part headers), replacing the round-2 largest-part
    heuristic. Prefers the part that carries a filename or an image/*
    content type (the reference reads request.files['image'],
    flask_rest_api/restapi.py:21-29); falls back to the first part with a
    payload. Returns None when the body isn't parseable multipart."""
    import email.parser
    import email.policy

    try:
        msg = email.parser.BytesParser(policy=email.policy.default).parsebytes(
            b"Content-Type: " + content_type.encode("latin-1") + b"\r\n\r\n" + raw
        )
    except Exception:
        return None
    if not msg.is_multipart():
        return None
    first = None
    for part in msg.iter_parts():
        payload = part.get_payload(decode=True)
        if not payload:
            continue
        if part.get_filename() or part.get_content_type().startswith("image/"):
            return payload
        if first is None:
            first = payload
    return first


class Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, {"status": "ok"})
        else:
            self._send(404, {"error": "POST an image to /v1/object-detection/<model>"})

    def do_POST(self):
        if not self.path.startswith("/v1/object-detection/"):
            self._send(404, {"error": "unknown route"})
            return
        try:
            import cv2

            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            if not raw:
                self._send(400, {"error": "empty body"})
                return
            ctype = self.headers.get("Content-Type", "")
            if ctype.lower().startswith("multipart/"):
                raw = parse_multipart_image(raw, ctype)
                if raw is None:
                    self._send(400, {"error": "could not parse multipart body"})
                    return
            img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self._send(400, {"error": "could not decode image"})
                return
            self._send(200, infer(img))
        except Exception as e:  # noqa: BLE001 - report any failure as 500
            self._send(500, {"error": str(e)})

    def log_message(self, fmt, *args):
        LOGGER.info("serve: " + fmt % args)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="yolo-somi")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--host", default="0.0.0.0")
    args = parser.parse_args(argv)

    global _MODEL
    from yolosomi_tpu.api import load

    _MODEL = load(args.cfg, args.weights, imgsz=args.imgsz, conf=args.conf)
    # warm the compile so the first request is fast
    _MODEL(np.zeros((320, 320, 3), np.uint8))
    LOGGER.info(f"serving on http://{args.host}:{args.port}/v1/object-detection/model")
    ThreadingHTTPServer((args.host, args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
