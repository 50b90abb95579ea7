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

from yolosomi_tpu.utils.general import LOGGER

_MODEL = None  # AutoShape, set in main()


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
            # accept raw image bytes or multipart (take the largest part)
            if b"\r\n\r\n" in raw and raw[:2] == b"--":
                parts = raw.split(b"\r\n\r\n")
                raw = max(parts, key=len).rsplit(b"\r\n--", 1)[0]
            img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self._send(400, {"error": "could not decode image"})
                return
            results = _MODEL(img)
            records = results.pandas()[0].to_dict(orient="records")
            self._send(200, records)
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
