"""Streaming time-to-first-sentence benchmark on the real TPU (run manually).

docs/PERF.md's decode numbers are all full-lyric latencies; streaming's
whole point is delivering the FIRST 22-token sentence early, so this tool
measures what a streaming client actually feels at the service level
(`GenerationService.stream`, the exact generator `/generate_stream` wraps):

* **TTFS** — time from stream() to the first block materialized on host
  (prefill + one chunk program dispatch),
* inter-block cadence (p50 gap between consecutive sentences),
* total stream latency vs the one-shot `generate_sync` p50 for the same
  request — the price paid for chunked dispatch (per-chunk tunnel/dispatch
  fixed cost × 10 blocks instead of × 1),
* token identity stream == batched for every measured (sample, seed)
  (the serving contract, serve.py `stream` docstring).

With ``--concurrent N`` it additionally measures N SIMULTANEOUS streaming
clients against one service — since r05 streams ride the window batcher
(they pack into shared batched windows, serve.py module docstring), so
this mode certifies that concurrent streams sustain ~batched-window
service throughput instead of the old per-lane batch-1 rate, while each
client still gets block-by-block delivery.

Every block arrives as a host numpy array (a device→host transfer), so
per-block timestamps are real data-arrival times, not dispatch returns
(CLAUDE.md timing rule). Run on an idle host:

    python tools/bench_stream.py [--streams 10] [--chunk 22]
    python tools/bench_stream.py --concurrent 64 --buckets 8,64

Prints one JSON line (same convention as bench_serve.py / bench_latency.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _p50(xs):
    return float(np.percentile(np.asarray(xs, np.float64), 50))


def _bench_concurrent(svc, payloads, n, length, rounds=3):
    """N simultaneous stream() clients per round; returns aggregate tok/s
    over the round wall (first stream start → last block on host) plus
    per-client TTFS/total percentiles, p50 over rounds."""
    import threading

    per_round = []
    for r in range(rounds):
        ttfs = [None] * n
        totals = [None] * n
        counts = [0] * n

        def client(i):
            t0 = time.perf_counter()
            for blk in svc.stream(payloads[i % len(payloads)],
                                  seed=10_000 * (r + 1) + i):
                if ttfs[i] is None:
                    ttfs[i] = time.perf_counter() - t0
                counts[i] += blk.size
            totals[i] = time.perf_counter() - t0

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert all(c == length for c in counts), counts
        per_round.append({
            "tok_s": n * length / wall,
            "wall_s": wall,
            "ttfs_ms_p50": _p50([x * 1e3 for x in ttfs]),
            "total_ms_p50": _p50([x * 1e3 for x in totals]),
        })
    per_round.sort(key=lambda d: d["tok_s"])
    return per_round[len(per_round) // 2], per_round


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=10,
                    help="measured streams (after 1 warmup)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="tokens per block (default: frame length, 22)")
    ap.add_argument("--buckets", default="8", type=str,
                    help="service buckets (sized bucket 8 = latency tier; "
                         "auto weights/cache pin from the largest)")
    ap.add_argument("--concurrent", type=int, default=0,
                    help="measure N simultaneous streaming clients "
                         "(window-batched) instead of the sequential "
                         "TTFS loop; size --buckets to N")
    ap.add_argument("--rounds", type=int, default=3,
                    help="concurrent-mode rounds (reports the p50 round)")
    args = ap.parse_args()

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from serve_common import build_model, make_payload

    from mmtg_tpu.serve import GenerationService

    params, const, mcfg, dcfg, gcfg = build_model("auto")
    buckets = tuple(int(b) for b in args.buckets.split(","))
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=buckets).start()
    try:
        payloads = [make_payload(i, dcfg, mcfg)
                    for i in range(max(args.streams, args.concurrent) + 1)]

        print("# warmup stream (compiles prefill + chunk programs)...",
              flush=True)
        for _ in svc.stream(payloads[0], seed=0, chunk=args.chunk):
            pass
        # one-shot warmup too (separate compiled program: full-length scan)
        svc.generate_sync(payloads[0], seed=0)
        if args.concurrent:
            svc.warmup()  # every bucket, both program kinds
            mid, rounds = _bench_concurrent(
                svc, payloads, args.concurrent, gcfg.length, args.rounds
            )
            st = svc.stats()
            out = {
                "metric": f"concurrent streaming throughput "
                          f"({args.concurrent} clients, window-batched)",
                "value": round(mid["tok_s"], 1),
                "unit": "tok/s",
                "vs_baseline": None,
                "detail": {
                    "concurrent": args.concurrent,
                    "rounds": [
                        {k: round(v, 1) for k, v in r.items()}
                        for r in rounds
                    ],
                    "ttfs_ms_p50": round(mid["ttfs_ms_p50"], 1),
                    "stream_total_ms_p50": round(mid["total_ms_p50"], 1),
                    "mean_batch": round(st["mean_batch"], 1),
                    "windows": st["batches"],
                    "buckets": list(buckets),
                    "gcfg": {"weight_dtype": svc.gcfg.weight_dtype,
                             "cache_dtype": svc.gcfg.cache_dtype,
                             "length": gcfg.length},
                },
            }
            print(json.dumps(out), flush=True)
            return

        ttfs, gaps, totals, oneshot = [], [], [], []
        for i in range(1, args.streams + 1):
            sample, seed = payloads[i], 1000 + i
            t0 = time.perf_counter()
            stamps, blocks = [], []
            for block in svc.stream(sample, seed, chunk=args.chunk):
                stamps.append(time.perf_counter() - t0)  # block is on host
                blocks.append(block)
            ttfs.append(stamps[0] * 1e3)
            gaps.extend(np.diff(stamps) * 1e3)
            totals.append(stamps[-1] * 1e3)

            t0 = time.perf_counter()
            tokens = svc.generate_sync(sample, seed)
            _ = np.asarray(tokens)  # already host-side; keep symmetry
            oneshot.append((time.perf_counter() - t0) * 1e3)
            streamed = np.concatenate(blocks)
            batched = np.asarray(tokens)[1:]  # drop the [#START#] seed
            if not np.array_equal(streamed, batched):
                raise SystemExit(
                    f"stream != batched for seed {seed}: "
                    f"{int((streamed != batched).sum())} tokens differ"
                )

        n_blocks = -(-gcfg.length // (args.chunk or dcfg.sent_frame_length))
        out = {
            "metric": "streaming time-to-first-sentence (service level, "
                      "batch 1)",
            "value": round(_p50(ttfs), 1),
            "unit": "ms",
            "vs_baseline": None,
            "detail": {
                "streams": args.streams,
                "chunk_tokens": args.chunk or dcfg.sent_frame_length,
                "blocks_per_stream": n_blocks,
                "ttfs_ms_p50": round(_p50(ttfs), 1),
                "ttfs_ms_best": round(min(ttfs), 1),
                # chunk >= length => one block per stream, no gaps
                "inter_block_ms_p50": round(_p50(gaps), 1) if gaps else None,
                "stream_total_ms_p50": round(_p50(totals), 1),
                "oneshot_ms_p50": round(_p50(oneshot), 1),
                "stream_overhead_ms_p50": round(
                    _p50(totals) - _p50(oneshot), 1
                ),
                "tokens_identical_to_batched": True,
                "gcfg": {"weight_dtype": svc.gcfg.weight_dtype,
                         "cache_dtype": svc.gcfg.cache_dtype,
                         "length": gcfg.length},
            },
        }
        print(json.dumps(out), flush=True)
    finally:
        svc.stop()


if __name__ == "__main__":
    main()
