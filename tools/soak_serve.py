"""Serving soak: open-loop Poisson traffic against the window-batching
service on the real TPU, with periodic stats snapshots.

Unlike tools/bench_serve.py's closed-loop clients (which can never
overload the service — each client waits for its reply), this drives
OPEN-LOOP arrivals at a fixed rate, the regime where backlog growth,
latency drift, stats-counter leaks, or collector stalls would actually
show up. Usage (idle host, real chip):

    python tools/soak_serve.py --rate 300 --duration_s 600

Prints one JSON snapshot line per interval and a final summary; exits
nonzero if the soak fails (lost replies, unbounded backlog, errors).
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=300.0,
                    help="mean arrivals/s (service capacity measured ~410)")
    ap.add_argument("--producers", type=int, default=1,
                    help="arrival threads (one caps at ~230/s; use several "
                         "to reach or exceed service capacity)")
    ap.add_argument("--duration_s", type=float, default=600.0)
    ap.add_argument("--snapshot_every_s", type=float, default=30.0)
    ap.add_argument("--buckets", default="8,32,128", type=str)
    ap.add_argument("--max_wait_ms", type=float, default=40.0)
    ap.add_argument("--cache-dtype", default="int8",
                    choices=["model", "int8", "int4"])
    ap.add_argument("--max_queue_depth", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
    from mmtg_tpu.models.mmtg import init_mmtg_params
    from mmtg_tpu.serve import GenerationService, ServiceOverloaded

    mcfg, dcfg = ModelConfig(), DataConfig()
    gcfg = GenerateConfig(cache_dtype=args.cache_dtype)
    rng = np.random.default_rng(0)
    params = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=jnp.bfloat16)
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)),
            jnp.bfloat16,
        )
    }
    P, E = dcfg.topic_prompt_length, dcfg.wenlan_emb_size
    # a small pool of pre-built payloads (arrival loop must be cheap)
    pool = []
    for i in range(64):
        r = np.random.default_rng(i)
        pool.append({
            "topic_ids": r.integers(103, 8000, (P,)).astype(np.int32),
            "tpw_attention_mask": np.ones((P,), np.int32),
            "tpw_type_ids": np.ones((P,), np.int32),
            "topic_emb": r.standard_normal((E,)).astype(np.float32),
            "img_embs": r.standard_normal((5, E)).astype(np.float32),
            "r_embs": r.standard_normal((5, E)).astype(np.float32),
        })

    buckets = tuple(int(b) for b in args.buckets.split(","))
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=buckets, max_wait_ms=args.max_wait_ms,
                            max_queue_depth=args.max_queue_depth)
    svc.start()
    print("# warming up ...", flush=True)
    svc.warmup()

    lock = threading.Lock()
    state = {"submitted": 0, "done": 0, "failed": 0, "rejected": 0}
    lats: list[float] = []

    def on_done(t0):
        def cb(fut):
            with lock:
                if fut.exception() is None:
                    state["done"] += 1
                    lats.append(time.monotonic() - t0)
                else:
                    state["failed"] += 1
        return cb

    stop = threading.Event()

    def producer(pid):
        arr_rng = np.random.default_rng(1234 + pid)
        i = pid * 10_000_000
        per_thread_rate = args.rate / args.producers
        while not stop.is_set():
            time.sleep(float(arr_rng.exponential(1.0 / per_thread_rate)))
            t0 = time.monotonic()
            try:
                fut = svc.submit(pool[i % len(pool)], seed=i)
            except ServiceOverloaded:
                with lock:
                    state["rejected"] += 1
            else:
                with lock:
                    state["submitted"] += 1
                fut.add_done_callback(on_done(t0))
            i += 1

    prods = [threading.Thread(target=producer, args=(p,), daemon=True)
             for p in range(args.producers)]
    t_start = time.monotonic()
    for prod in prods:
        prod.start()
    ok = True
    max_backlog = 0
    while time.monotonic() - t_start < args.duration_s:
        time.sleep(args.snapshot_every_s)
        with lock:
            snap = dict(state)
            lat = sorted(lats)
        st = svc.stats()
        backlog = snap["submitted"] - snap["done"] - snap["failed"]
        max_backlog = max(max_backlog, backlog)
        line = {
            "t_s": round(time.monotonic() - t_start, 1),
            **snap,
            "backlog": backlog,
            "mean_batch": round(st["mean_batch"], 1),
            "tokens_per_s": st["tokens_per_s"],
            "p50_s": round(lat[len(lat) // 2], 3) if lat else None,
            "p99_s": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))], 3)
            if lat else None,
        }
        print(json.dumps(line), flush=True)
    stop.set()
    for prod in prods:
        prod.join()
    # drain: everything submitted must resolve
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        with lock:
            if state["done"] + state["failed"] >= state["submitted"]:
                break
        time.sleep(1)
    svc.stop()
    with lock:
        snap = dict(state)
        lat = sorted(lats)
    st = svc.stats()
    lost = snap["submitted"] - snap["done"] - snap["failed"]
    summary = {
        "metric": "serving soak",
        "ok": bool(lost == 0 and snap["failed"] == 0
                   and st["errors"] == 0 and snap["done"] > 0),
        "duration_s": args.duration_s,
        "rate_req_s": args.rate,
        **snap,
        "lost": lost,
        "max_backlog": max_backlog,
        "service_errors": st["errors"],
        "tokens_served": st["tokens_served"],
        "p50_s": round(lat[len(lat) // 2], 3) if lat else None,
        "p95_s": round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3)
        if lat else None,
        "p99_s": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))], 3)
        if lat else None,
        "mean_batch": round(st["mean_batch"], 1),
    }
    print(json.dumps(summary), flush=True)
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
