"""HTTP-front serving benchmark on the real TPU (run manually).

tools/bench_serve.py measures the window-batching service at the Python
API; this tool measures the full production path — HTTP parse, request
decode (JSON vs binary npz), the service, JSON response — with keep-alive
client connections, so the delta to the service-level number is the
transport + encode cost a real deployment pays.

Per encoding it reports sustained tok/s, req/s, latency percentiles and
the request payload size. The npz body is ~90 KB (raw f32 embeddings)
vs ~250+ KB of JSON floats that each cost a Python float parse; at high
request rates the JSON decode is host CPU stolen from the batcher.

Prints one JSON line per (encoding, scenario). Usage (idle host):
    python tools/bench_serve_http.py [--clients 64] [--requests 256]
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _encode_json(sample: dict, seed: int) -> tuple[bytes, str]:
    body = json.dumps({
        "sample": {k: np.asarray(v).tolist() for k, v in sample.items()},
        "seed": seed,
        "text": False,
    }).encode()
    return body, "application/json"


def _encode_npz(sample: dict, seed: int) -> tuple[bytes, str]:
    from mmtg_tpu.serve import NPZ_CONTENT_TYPE, encode_request_npz

    return encode_request_npz(sample, seed=seed, text=False), NPZ_CONTENT_TYPE


def run_scenario(port: int, payloads: list, encoding: str, clients: int,
                 gen_len: int, extra: dict) -> dict:
    """Closed-loop: ``clients`` threads with keep-alive connections drain
    the shared payload list back-to-back."""
    enc = _encode_json if encoding == "json" else _encode_npz
    t_enc0 = time.perf_counter()
    bodies = [enc(p, i) for i, p in enumerate(payloads)]
    encode_s = time.perf_counter() - t_enc0

    counter = {"next": 0}
    lock = threading.Lock()
    lat: list = []
    errors: list = []

    def client():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        try:
            while True:
                with lock:
                    i = counter["next"]
                    if i >= len(bodies):
                        return
                    counter["next"] += 1
                body, ctype = bodies[i]
                t = time.monotonic()
                conn.request("POST", "/generate", body=body,
                             headers={"Content-Type": ctype})
                resp = conn.getresponse()
                data = resp.read()
                dt = time.monotonic() - t
                with lock:
                    if resp.status != 200:
                        errors.append((resp.status, data[:200]))
                    else:
                        lat.append(dt)
        finally:
            conn.close()

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    n_ok = len(lat)
    return {
        "metric": f"HTTP serving throughput ({encoding}, {clients} clients)",
        "value": round(n_ok * gen_len / wall, 1),
        "unit": "tok/s",
        "detail": {
            "requests_ok": n_ok,
            "errors": len(errors),
            "first_error": errors[0][1].decode("utf-8", "replace")
            if errors else None,
            "wall_s": round(wall, 2),
            "requests_per_s": round(n_ok / wall, 2),
            "p50_latency_s": round(lat[n_ok // 2], 3) if n_ok else None,
            "p95_latency_s": round(lat[int(n_ok * 0.95)], 3) if n_ok else None,
            "payload_bytes": len(bodies[0][0]),
            "client_encode_ms_per_req": round(
                encode_s / len(bodies) * 1e3, 2),
            **extra,
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--requests", type=int, default=256,
                    help="requests per encoding scenario")
    ap.add_argument("--buckets", default="8,16,32,64", type=str)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    ap.add_argument("--cache-dtype", default="int8",
                    choices=["model", "int8", "int4"])
    ap.add_argument("--encodings", default="json,npz", type=str)
    args = ap.parse_args()

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from serve_common import build_model, make_payload

    from mmtg_tpu.serve import GenerationService, serve_http

    params, const, mcfg, dcfg, gcfg = build_model(args.cache_dtype)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=buckets, max_wait_ms=args.max_wait_ms)
    svc.start()
    print(f"# warming up buckets {buckets} ...", flush=True)
    t0 = time.perf_counter()
    svc.warmup()
    print(f"# warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    httpd = serve_http(svc, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    payloads = [make_payload(i, dcfg, mcfg) for i in range(args.requests)]
    extra = {"buckets": list(buckets), "max_wait_ms": args.max_wait_ms,
             "cache_dtype": args.cache_dtype}
    try:
        for encoding in args.encodings.split(","):
            out = run_scenario(port, payloads, encoding.strip(),
                               args.clients, gcfg.length, extra)
            print(json.dumps(out), flush=True)
    finally:
        httpd.shutdown()
        svc.stop()


if __name__ == "__main__":
    main()
