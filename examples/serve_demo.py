"""Walkthrough: the resident face-extraction service and its three transports.

Runs a FaceService in-process, round-trips one request over each transport
(unix socket, TCP, HTTP/JSON), and prints the results. Uses synthetic
frames + seeded random weights so it runs anywhere; swap in converted
checkpoints under weights/ for real detections.

    python examples/serve_demo.py
"""

import base64
import json
import os.path as osp
import sys
import tempfile
import threading
import urllib.request

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from videotofaces_tpu.serve import (FaceService, ServeClient,  # noqa: E402
                                    make_http_server, make_server)


def main():
    frames = [np.random.default_rng(i).integers(0, 255, size=(360, 640, 3),
                                                dtype=np.uint8)
              for i in range(3)]

    print("building FaceService (live style, YOLO + FaceNet)...")
    svc = FaceService(style="live", max_batch=8)
    svc.warmup(resolutions=[(360, 640)], batches=(4,), embed_batches=(4,))

    # 1. unix socket
    sock_path = osp.join(tempfile.mkdtemp(), "v2f.sock")
    srv = make_server(svc, sock_path)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    client = ServeClient(sock_path)
    res = client.detect(frames)
    print("unix socket: %d frames -> %s faces" % (len(frames),
                                                  [len(b) for b, _ in res]))
    client.close()
    srv.shutdown()

    # 2. TCP (same framed protocol)
    tsrv = make_server(svc, ("127.0.0.1", 0))
    threading.Thread(target=tsrv.serve_forever, daemon=True).start()
    tclient = ServeClient(tsrv.server_address[:2])
    ex = tclient.extract(frames[:1])
    print("tcp: extract -> %d faces, embedding dim %s"
          % (len(ex[0]["boxes"]),
             ex[0]["embeddings"].shape[-1] if len(ex[0]["boxes"]) else "n/a"))
    tclient.close()
    tsrv.shutdown()

    # 3. HTTP/JSON gateway (base64 images — curl-friendly)
    import cv2

    hsrv = make_http_server(svc, ("127.0.0.1", 0))
    threading.Thread(target=hsrv.serve_forever, daemon=True).start()
    host, port = hsrv.server_address[:2]
    b64 = [base64.b64encode(cv2.imencode(".jpg", f)[1]).decode()
           for f in frames]
    req = urllib.request.Request(
        "http://%s:%d/detect" % (host, port),
        data=json.dumps({"frames": b64}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    print("http: %s" % [len(r["boxes"]) for r in out["results"]])
    print("service stats:", svc.stats)
    hsrv.shutdown()


if __name__ == "__main__":
    main()
