"""Service-level serving benchmark on the real TPU (run manually).

Measures the window-batching service (mmtg_tpu/serve.py) end to end —
batcher overhead included — at the full MMTG size, against the direct
`decoding.generate` numbers in docs/PERF.md "Serving". Two scenarios:

  * saturation: C closed-loop client threads submit back-to-back for a
    fixed number of requests → sustained tok/s, latency percentiles,
    mean realized batch;
  * solo: single requests with a zero-length window → the floor latency
    one isolated user sees.

Prints one JSON line per scenario. Usage (real chip, idle host):
    python tools/bench_serve.py [--clients 64] [--requests 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--requests", type=int, default=256,
                    help="total requests in the saturation scenario")
    ap.add_argument("--buckets", default="8,16,32,64", type=str)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    ap.add_argument("--cache-dtype", default="int8",
                    choices=["model", "int8", "int4"])
    ap.add_argument("--solo-runs", type=int, default=5)
    args = ap.parse_args()

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from serve_common import build_model, make_payload

    from mmtg_tpu.serve import GenerationService

    params, const, mcfg, dcfg, gcfg = build_model(args.cache_dtype)

    def sample(i):
        return make_payload(i, dcfg, mcfg)

    buckets = tuple(int(b) for b in args.buckets.split(","))
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=buckets, max_wait_ms=args.max_wait_ms)
    svc.start()
    print(f"# warming up buckets {buckets} ...", flush=True)
    t0 = time.perf_counter()
    svc.warmup()
    print(f"# warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    # ---- saturation -------------------------------------------------------
    n_total = args.requests
    counter = {"next": 0}
    lock = threading.Lock()
    lat = []
    # pre-build every request payload: the bench must measure the service,
    # not 2048-wide numpy sample construction inside the client threads
    payloads = [sample(i) for i in range(n_total)]

    def client():
        while True:
            with lock:
                i = counter["next"]
                if i >= n_total:
                    return
                counter["next"] += 1
            t = time.monotonic()
            svc.generate_sync(payloads[i], seed=i)
            with lock:
                lat.append(time.monotonic() - t)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    st = svc.stats()
    print(json.dumps({
        "metric": "serving throughput (service-level, %d clients)" % args.clients,
        "value": round(n_total * gcfg.length / wall, 1),
        "unit": "tok/s",
        "detail": {
            "requests": n_total,
            "clients": args.clients,
            "wall_s": round(wall, 2),
            "requests_per_s": round(n_total / wall, 2),
            "p50_latency_s": round(lat[len(lat) // 2], 3),
            "p95_latency_s": round(lat[int(len(lat) * 0.95)], 3),
            "mean_batch": round(st["mean_batch"], 1),
            "batches": st["batches"],
            "mean_fill": round(st["mean_fill"], 3),
            "buckets": list(buckets),
            "max_wait_ms": args.max_wait_ms,
            "cache_dtype": args.cache_dtype,
        },
    }), flush=True)

    # ---- solo latency ------------------------------------------------------
    # dedicated zero-window service: an isolated user should not pay the
    # saturation config's straggler window; the smallest bucket's program
    # is already compiled in this process, so this is free to stand up
    svc.stop()
    from mmtg_tpu.serve import GenerationService as _GS

    solo_svc = _GS(params, const, mcfg, dcfg, gcfg,
                   buckets=(buckets[0],), max_wait_ms=0.0).start()
    solo = []
    for i in range(args.solo_runs):
        t = time.monotonic()
        solo_svc.generate_sync(sample(10_000 + i), seed=i)
        solo.append(time.monotonic() - t)
    solo.sort()
    print(json.dumps({
        "metric": "serving solo-request latency (zero-window service)",
        "value": round(solo[len(solo) // 2], 3),
        "unit": "s",
        "detail": {"runs": args.solo_runs,
                   "best_s": round(solo[0], 3),
                   "bucket": buckets[0]},
    }), flush=True)
    solo_svc.stop()


if __name__ == "__main__":
    main()
