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

Every block arrives as a host numpy array (a device→host transfer), so
per-block timestamps are real data-arrival times, not dispatch returns
(CLAUDE.md timing rule). Run on an idle host:

    python tools/bench_stream.py [--streams 10] [--chunk 22]

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=10,
                    help="measured streams (after 1 warmup)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="tokens per block (default: frame length, 22)")
    ap.add_argument("--buckets", default="8", type=str,
                    help="service buckets (sized bucket 8 = latency tier; "
                         "auto weights/cache pin from the largest)")
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
                    for i in range(args.streams + 1)]

        print("# warmup stream (compiles prefill + chunk programs)...",
              flush=True)
        for _ in svc.stream(payloads[0], seed=0, chunk=args.chunk):
            pass
        # one-shot warmup too (separate compiled program: full-length scan)
        svc.generate_sync(payloads[0], seed=0)

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
