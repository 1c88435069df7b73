"""HTTP front-end overhead: server roundtrip minus direct predict.

Starts ``scat_tpu.server.make_server`` in-process on an ephemeral port,
then times the same request batch (a) directly through
``predictor.predict`` and (b) over HTTP (raw uint8 body in, JSON out).
The difference is the wire cost of the front end — request parse,
``np.frombuffer``, JSON encode of the [N,21,3]+[N,21,2]+[N,3] outputs,
and loopback TCP — independent of what the device adds.

Run on CPU to isolate the overhead from device/tunnel time:
    JAX_PLATFORMS=cpu python benchmarks/bench_http.py
"""

import json
import http.client
import threading
import time

import numpy as np


def main() -> None:
    from scat_tpu.config import Options
    from scat_tpu.serving import HandPosePredictor
    from scat_tpu.server import make_server

    img = 64  # small crops: keeps device time low so the delta is wire
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  compute_dtype="float32", use_pallas_attention=False,
                  checkpoint_path_eval="/nonexistent")
    predictor = HandPosePredictor.from_checkpoint(opt, image_size=img)
    httpd = make_server(predictor, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]

    rows = []
    for bs in (1, 8, 32):
        x = (np.random.RandomState(0).rand(bs, img, img, 3) * 255
             ).astype(np.uint8)
        predictor.predict(x)  # warm both programs for this bucket
        reps = 30

        t0 = time.perf_counter()
        for _ in range(reps):
            predictor.predict(x)
        direct_ms = (time.perf_counter() - t0) / reps * 1e3

        body = x.tobytes()
        headers = {"X-Shape": ",".join(map(str, x.shape)),
                   "X-Dtype": "uint8"}
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/predict", body=body, headers=headers)
        conn.getresponse().read()  # warm the connection path
        t0 = time.perf_counter()
        for _ in range(reps):
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=60)
            conn.request("POST", "/predict", body=body, headers=headers)
            conn.getresponse().read()
        http_ms = (time.perf_counter() - t0) / reps * 1e3
        rows.append({"batch": bs, "direct_ms": round(direct_ms, 2),
                     "http_ms": round(http_ms, 2),
                     "overhead_ms": round(http_ms - direct_ms, 2)})
    httpd.shutdown()
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
