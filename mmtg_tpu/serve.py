"""Production serving layer: window-batching generation service + HTTP front.

The reference's only interactive path is the ``predict.py`` REPL, batch 1
by its own admission (``predict.py:76`` "batch size 1 for now - could be
updated for more but the code would be less clear"; the loop at
``predict.py:215-226`` serves one user index at a time with 220 full
re-forwards per token). This module is that "updated for more": a service
that collects concurrent generation requests into padded fixed-shape
batches and decodes each batch in ONE compiled program
(:func:`mmtg_tpu.decoding.generate`).

Design (TPU-first — see docs/PERF.md for the measurements behind each):

* **Window batching, not per-token continuous batching.** On this platform
  a host→device dispatch costs ~30-40 ms (the tunnel dispatch floor), so a
  per-token host loop with slot refills would pay that floor 220× per
  request; one fixed-length ``lax.scan`` per window pays it once. Requests
  arriving while a window decodes queue for the next window, and windows
  are DOUBLE-BUFFERED: device dispatch is async, so the batcher packs and
  launches window N+1 while window N decodes and a collector thread
  resolves futures as results land. The measured batch/latency curve
  (docs/PERF.md "Serving") sets the bucket menu.
* **Fixed batch buckets.** Each request batch is padded up to the smallest
  configured bucket, so every shape the service ever runs compiles once
  (and persists across restarts via the compilation cache).
* **Per-request PRNG streams** (``decoding.generate(row_seeds=...)``): a
  request's tokens depend only on ``(service base seed, request seed)`` —
  NOT on which other requests share its batch — so the batcher groups
  requests freely without changing anyone's output, and a client can
  replay any response deterministically.
* **Streaming rides the window batcher** (``POST /generate_stream`` →
  Server-Sent Events): a streamed request is packed into an ordinary
  batched window next to one-shot requests. Because the per-row PRNG
  stream is keyed on the global step, a streamed response is
  TOKEN-IDENTICAL to the batched one for the same (sample, seed) — so
  nothing about the window changes except HOW it decodes: any window
  containing a streamer runs the chunked scan
  (:func:`mmtg_tpu.decoding.generate_stream`, or
  :func:`~mmtg_tpu.decoding.generate_stream_sharded` on meshed services —
  the decode state stays on-mesh between chunks) and the collector fans
  each materialized block out to its stream subscribers sentence-by-
  sentence while one-shot batch-mates get the assembled result at the
  end. N concurrent streams therefore sustain batched-window throughput
  (they ARE a batched window), time-to-first-sentence ≈ prefill + one
  chunk, and overload sheds at the same queue edge as everything else.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import zipfile
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig

# the reference-keyed per-sample arrays a request must carry
# (MyDataset.py test rows; same keys generate.py's replicate_batch stacks)
SAMPLE_KEYS = (
    "topic_ids",
    "tpw_attention_mask",
    "tpw_type_ids",
    "topic_emb",
    "img_embs",
    "r_embs",
)
_FLOAT_KEYS = ("topic_emb", "img_embs", "r_embs")

# Binary request format for POST /generate: a standard ``.npz`` archive
# (Content-Type: application/x-npz, or auto-detected by the zip magic).
# A sample is ~22.5k f32 values (topic_emb 2048 + img_embs/r_embs 5x2048
# at reference dims, MyDataset.py test rows) — ~250 KB and a full Python
# float-parse as JSON, ~90 KB and a zero-copy read as npz. The response
# stays JSON (tokens are ~220 ints; encoding cost is negligible).
NPZ_CONTENT_TYPE = "application/x-npz"
_ZIP_MAGIC = b"PK\x03\x04"
# npz scalar sidecar keys (everything else must be a SAMPLE_KEYS array)
_NPZ_META_KEYS = ("seed", "timeout", "text")


def encode_request_npz(sample: Dict[str, np.ndarray], seed: int = 0,
                       timeout: Optional[float] = None,
                       text: Optional[bool] = None) -> bytes:
    """Client-side encoder for the binary /generate request body.

    Mirrors the JSON schema: the six SAMPLE_KEYS arrays plus optional
    scalar entries ``seed`` / ``timeout`` / ``text``. Uncompressed
    ``savez`` — the payload is float embeddings, zlib buys ~nothing and
    costs CPU on both ends."""
    import io

    arrays = {k: np.asarray(sample[k]) for k in sample}
    arrays["seed"] = np.int64(seed)
    if timeout is not None:
        arrays["timeout"] = np.float64(timeout)
    if text is not None:
        arrays["text"] = np.bool_(text)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def decode_request_npz(body: bytes) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Server-side decoder: returns ``(sample, meta)`` where meta carries
    the same defaults the JSON path uses (seed 0, timeout 600, text True).
    ``allow_pickle`` stays False (np.load default): object arrays from an
    untrusted client must not deserialize."""
    import io

    with np.load(io.BytesIO(body)) as z:
        sample = {k: z[k] for k in z.files if k not in _NPZ_META_KEYS}
        meta = {
            "seed": int(z["seed"]) if "seed" in z.files else 0,
            "timeout": float(z["timeout"]) if "timeout" in z.files else 600.0,
            "text": bool(z["text"]) if "text" in z.files else True,
        }
    return sample, meta


class ServiceOverloaded(RuntimeError):
    """Raised by submit() when the request queue is at max_queue_depth —
    shed load at the edge (HTTP 503) instead of growing an unbounded
    host-side backlog."""


@dataclass
class _Pending:
    sample: Dict[str, np.ndarray]
    seed: int
    future: Future
    t_submit: float = field(default_factory=time.monotonic)
    # streaming subscribers: a queue the collector feeds decoded blocks
    # ([n] int32 rows), then a ``None`` done-sentinel (or an exception).
    # ``None`` here = an ordinary one-shot request.
    blocks: Optional["queue.Queue"] = None


class GenerationService:
    """Threaded window-batching front over the compiled decode engine.

    Args:
      params/const/mcfg/dcfg/gcfg: exactly what :func:`decoding.generate`
        takes; ``gcfg`` is service-wide (sampling hyperparameters are
        static under jit — per-request overrides would recompile, so the
        canonical ``generate.sh:10-14`` config is fixed at service start).
      buckets: ascending batch sizes to pad to; each compiles once.
      max_wait_ms: how long the batcher holds an open window for
        stragglers after the first request arrives. 0 = dispatch
        immediately (lowest latency, worst fill).
      base_seed: service-wide PRNG base; together with the per-request
        ``seed`` it fully determines a response.
      mesh: optional ``jax.sharding.Mesh`` — batches decode DP×TP over it
        via :func:`decoding.generate_sharded`. Per-request streams make
        responses identical to single-device serving token-for-token
        (``tests/test_serve.py``), so scaling out never changes outputs.
    """

    def __init__(
        self,
        params,
        const,
        mcfg: ModelConfig,
        dcfg: DataConfig,
        gcfg: GenerateConfig,
        buckets: Sequence[int] = (8, 16, 32, 64),
        max_wait_ms: float = 25.0,
        base_seed: int = 0,
        mesh=None,
        max_queue_depth: int = 4096,
        stall_unhealthy_s: float = 120.0,
    ):
        if list(buckets) != sorted(set(int(b) for b in buckets)) or not buckets:
            raise ValueError(f"buckets must be ascending and unique: {buckets}")
        if mesh is not None:
            from mmtg_tpu.parallel.mesh import DATA_AXIS

            dp = mesh.shape[DATA_AXIS]
            bad = [b for b in buckets if b % dp]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by the mesh data axis ({dp})"
                )
        self.mesh = mesh
        if mesh is not None:
            # checkpoint-restored params arrive committed to ONE device
            # (Orbax restores SingleDeviceSharding); shard_map over the
            # mesh rejects that placement. Replicate params+const over
            # the mesh up front — generate_sharded's in_specs then
            # reshard (TP splits) lazily via GSPMD.
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            repl = NamedSharding(mesh, _P())
            params = jax.tree.map(lambda x: jax.device_put(x, repl), params)
            const = jax.tree.map(lambda x: jax.device_put(x, repl), const)
        self.params = params
        self.const = const
        self.mcfg = mcfg
        self.dcfg = dcfg
        self.buckets = tuple(int(b) for b in buckets)
        if "auto" in (gcfg.weight_dtype, gcfg.cache_dtype):
            # resolve ONCE from the LARGEST bucket: every bucket must
            # share one weight AND cache precision or the same
            # (request, seed) would decode differently depending on
            # which bucket its window landed in — breaking
            # batch-composition invariance
            # (test_row_seeds_batch_composition_invariance)
            import dataclasses

            from mmtg_tpu.decoding import (resolve_cache_dtype,
                                           resolve_weight_dtype)

            gcfg = dataclasses.replace(
                gcfg,
                weight_dtype=resolve_weight_dtype(gcfg, max(self.buckets)),
                cache_dtype=resolve_cache_dtype(gcfg, max(self.buckets),
                                                sharded=mesh is not None),
            )
        self.gcfg = gcfg
        self.max_wait_ms = float(max_wait_ms)
        self._rng = jax.random.PRNGKey(base_seed)
        self.max_queue_depth = int(max_queue_depth)
        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        # dispatched-but-uncollected windows; maxsize bounds device
        # in-flight work to 2 windows (device dispatch is async on the
        # TPU runtime — the batcher packs window N+1 while N decodes)
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        self._thread: Optional[threading.Thread] = None
        self._collector: Optional[threading.Thread] = None
        self._stopping = False
        # set when the batcher thread dies on an escaped error: submit()
        # then fails fast with the cause instead of queueing into a void
        self._engine_error: Optional[BaseException] = None
        self._lock = threading.Lock()
        # Liveness: a decode call that never returns (r05 75-min soak:
        # a tunnel stall at t≈70 min wedged the collector inside
        # np.asarray with zero completions for the rest of the run) is a
        # HANG, not a crash — no exception fires, /healthz kept saying
        # ok. The progress clock resets when a window is formed and when
        # one completes; "stalled" = work pending AND no progress for
        # stall_unhealthy_s. /healthz turns 503 so an orchestrator can
        # restart the process (the stuck device call itself cannot be
        # interrupted from Python).
        self.stall_unhealthy_s = float(stall_unhealthy_s)
        self._last_progress = time.monotonic()
        self._inflight_count = 0  # dispatched windows not yet collected
        self._stats = {
            "requests": 0,
            "batches": 0,
            "padded_rows": 0,
            "errors": 0,
            "cancelled": 0,
            "rejected": 0,
            "served": 0,
            "tokens_served": 0,
            "streams": 0,
            "stream_tokens": 0,
        }
        self._latencies_ms: list[float] = []
        self._t_start = time.monotonic()

    # ---- lifecycle -------------------------------------------------------

    def start(self) -> "GenerationService":
        if self._thread is not None:
            raise RuntimeError("service already started")
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mmtg-batcher")
        self._collector = threading.Thread(target=self._collect_loop,
                                           daemon=True, name="mmtg-collector")
        self._thread.start()
        self._collector.start()
        return self

    def stop(self, join_timeout_s: float = 120.0) -> None:
        if self._thread is None:
            return
        self._stopping = True  # submit() rejects from here on
        self._queue.put(None)
        self._thread.join(join_timeout_s)
        self._collector.join(join_timeout_s)
        wedged = (self._thread.is_alive() or self._collector.is_alive())
        if wedged:
            # a decode call that never returns (r05 soak: tunnel stall)
            # cannot be interrupted from Python — record the wedge, fail
            # the queued work, and leave the daemon threads to die with
            # the process instead of hanging shutdown forever
            self._engine_error = RuntimeError(
                f"engine wedged: worker threads did not join within "
                f"{join_timeout_s}s (in-flight device call never returned)"
            )
        self._thread = self._collector = None
        # belt-and-braces: fail any straggler that raced past the
        # _stopping check into the queue after the batcher drained it
        self._fail_queued(
            "service stopped before decoding" if not wedged
            else "service stopped while engine wedged"
        )
        self._stopping = False

    def _fail_queued(self, msg: str) -> None:
        while True:
            try:
                left = self._queue.get_nowait()
            except queue.Empty:
                return
            if left is not None and left.future.set_running_or_notify_cancel():
                err = RuntimeError(msg)
                left.future.set_exception(err)
                if left.blocks is not None:
                    # stream consumers wait on their block queue, not the
                    # future — surface the failure there too
                    left.blocks.put(err)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def warmup(self, bucket: Optional[int] = None,
               streams: bool = True) -> None:
        """Compile ahead of traffic: run one synthetic batch per bucket
        (or just ``bucket``) through the one-shot AND (``streams=True``)
        the chunked decode program a stream-carrying window uses. With
        the persistent compilation cache wired in (every CLI calls
        ``enable_compilation_cache``) this is a cache read after the
        first service start."""
        sizes = self.buckets if bucket is None else (bucket,)
        sample = self._synthetic_sample()
        for b in sizes:
            batch, seeds = self._pack([_Pending(sample, 0, Future())] * 1, b)

            def run():
                toks = self._decode(batch, seeds)
                # sync via a device->host transfer: on the axon platform
                # block_until_ready returns at DISPATCH, which would let
                # the remote compile ride into the first real request
                # (measured: a "4 s warmup" then a 68 s first request)
                float(jnp.sum(toks[:1]))
                if streams:
                    for blk in self._decode_chunked(batch, seeds):
                        pass
                    float(jnp.sum(blk[:1]))

            try:
                run()
            except Exception as e:
                # the tunnel occasionally throws one transient runtime
                # FAILED_PRECONDITION on first dispatch; a single retry
                # rides the compilation cache. Anything else is real.
                if "FAILED_PRECONDITION" not in str(e):
                    raise
                run()

    # ---- client API ------------------------------------------------------

    @staticmethod
    def _norm_seed(seed: int) -> int:
        # two's-complement into int32: the seed rides a [B] int32 array
        # into fold_in, and a client-supplied 2**40 must not blow up the
        # whole window in _pack
        seed = int(seed) & 0xFFFFFFFF
        return seed - 2**32 if seed >= 2**31 else seed

    def _enqueue(self, pending: _Pending) -> None:
        """Liveness + depth checks, the actual put, and the enqueue/death
        race sweep — shared by :meth:`submit` and :meth:`stream`."""
        if self._thread is None or self._stopping:
            raise RuntimeError("service not started or stopping")
        if self._engine_error is not None or not self._thread.is_alive():
            raise RuntimeError(
                f"engine is down (batcher thread dead): {self._engine_error!r}"
                " — restart the service"
            )
        if self._queue.qsize() >= self.max_queue_depth:
            with self._lock:
                self._stats["rejected"] += 1
            raise ServiceOverloaded(
                f"request queue at max_queue_depth={self.max_queue_depth}"
            )
        self._queue.put(pending)
        if self._engine_error is not None or not self._thread.is_alive():
            # closes the enqueue/death race: if the engine died between
            # the liveness check above and our put, the crash path's
            # queue drain may already have run — sweep again so THIS
            # request cannot hang on a dead engine
            self._fail_queued(
                f"engine died before decoding this request: "
                f"{self._engine_error!r}"
            )
        with self._lock:
            self._stats["requests"] += 1

    def submit(self, sample: Dict[str, np.ndarray], seed: int) -> Future:
        """Enqueue one sample; resolves to ``[1 + length]`` int32 tokens.

        Raises :class:`ServiceOverloaded` when the queue is at
        ``max_queue_depth`` (load is shed at the edge — HTTP 503 — rather
        than growing an unbounded host backlog)."""
        self._validate(sample)
        fut: Future = Future()
        self._enqueue(_Pending(
            {k: np.asarray(sample[k]) for k in SAMPLE_KEYS},
            self._norm_seed(seed), fut,
        ))
        return fut

    def generate_sync(self, sample, seed: int, timeout: float = 600.0):
        return self.submit(sample, seed).result(timeout=timeout)

    def stream(self, sample: Dict[str, np.ndarray], seed: int,
               chunk: Optional[int] = None):
        """Stream one request's tokens as they decode — ``[n]`` int32
        blocks (one 22-token lyric sentence per block by default).

        **Bit-identical to the batched path**: the per-row PRNG stream
        depends only on ``(base_seed, seed, step)``, so
        ``[START] + concat(blocks) == submit(sample, seed)`` token for
        token (``test_stream_matches_batched``) — a client can stream
        interactively and re-fetch the same lyric batched later. The
        reference has no streaming at all (its loop prints after the
        full 220-token sample, ``generate.py:97-145``).

        The request rides the SAME window batcher as :meth:`submit`: it
        is packed into the next window next to one-shot batch-mates, the
        window decodes through the chunked scan (on-mesh state between
        chunks — :func:`~mmtg_tpu.decoding.generate_stream_sharded` on
        meshed services), and the collector fans each decoded block out
        to this generator as it materializes. N concurrent streams
        therefore sustain batched-window throughput, and overload sheds
        at the queue edge (:class:`ServiceOverloaded` from the first
        ``next()``) exactly like ``submit``. Enqueueing happens lazily on
        first ``next()`` — an unconsumed generator never occupies a
        window row; shape/seed validation is eager.

        ``chunk`` re-chunks delivery host-side (buffer/split of the
        service-wide device cadence, one 22-token sentence per block), so
        any granularity is available without extra compiled programs; the
        device cadence itself — and so time-to-first-block for chunk <
        22 — stays the sentence frame."""
        self._validate(sample)
        if self._thread is None or self._stopping:
            raise RuntimeError("service not started or stopping")
        seed = self._norm_seed(seed)
        sample = {k: np.asarray(sample[k]) for k in SAMPLE_KEYS}
        want = (max(1, min(int(chunk), self.gcfg.length))
                if chunk else self.dcfg.sent_frame_length)

        def consume():
            q: "queue.Queue" = queue.Queue()
            self._enqueue(_Pending(sample, seed, Future(), blocks=q))
            with self._lock:
                self._stats["streams"] += 1
            buf = np.zeros((0,), np.int32)
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                if item is None:
                    break
                buf = np.concatenate([buf, item])
                while buf.size >= want:
                    yield buf[:want]
                    buf = buf[want:]
            if buf.size:
                yield buf

        return consume()

    def swap_params(self, new_params) -> None:
        """Hot-swap model weights with ZERO recompiles (identical
        shapes/dtypes hit every already-compiled bucket program — jit
        caches on abstract values, not weight identity). The window
        currently decoding finishes on the old weights; the next window
        sees the new ones (the batcher reads ``self.params`` once per
        window, and the swap is one atomic rebind)."""
        new_params = jax.tree.map(jnp.asarray, new_params)
        old = jax.tree.map(lambda x: x.shape, self.params)
        new = jax.tree.map(lambda x: x.shape, new_params)
        if old != new:
            raise ValueError(
                "new params do not match the serving model's tree/shapes — "
                "a different architecture needs a new service"
            )
        # cast to the serving dtypes: f32 checkpoints into a bf16 serving
        # model is the normal flow, and matching dtypes is what makes the
        # swap recompile-free
        new_params = jax.tree.map(
            lambda n, o: n.astype(o.dtype), new_params, self.params
        )
        if self.mesh is not None:
            # keep the mesh placement contract (__init__): a freshly
            # restored checkpoint is single-device-committed and would
            # fail the next sharded window
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            repl = NamedSharding(self.mesh, _P())
            new_params = jax.tree.map(
                lambda x: jax.device_put(x, repl), new_params
            )
        self.params = new_params

    def stats(self) -> Dict:
        with self._lock:
            out = dict(self._stats)
            lat = sorted(self._latencies_ms)
            pending = self._queue.qsize() + self._inflight_count
            out["pending"] = pending
            # seconds without a window forming/completing WHILE work is
            # pending — the hang signal (0 when idle)
            out["stalled_s"] = round(
                time.monotonic() - self._last_progress, 1
            ) if pending > 0 else 0.0
        n_b = max(out["batches"], 1)
        # "served" counts rows whose window COMPLETED (collector-side);
        # using submitted-minus-cancelled here would let a backlog push
        # mean_batch above the largest bucket
        served = out["served"]
        out["mean_fill"] = served / max(served + out["padded_rows"], 1)
        out["mean_batch"] = served / n_b
        out["uptime_s"] = round(time.monotonic() - self._t_start, 1)
        out["tokens_per_s"] = round(
            out["tokens_served"] / max(out["uptime_s"], 1e-9), 1
        )
        if lat:
            out["p50_latency_ms"] = lat[len(lat) // 2]
            out["p95_latency_ms"] = lat[min(len(lat) - 1, int(len(lat) * 0.95))]
        return out

    # ---- internals -------------------------------------------------------

    def _expected_shapes(self) -> Dict[str, tuple]:
        P, m = self.dcfg.topic_prompt_length, self.mcfg
        return {
            "topic_ids": (P,),
            "tpw_attention_mask": (P,),
            "tpw_type_ids": (P,),
            "topic_emb": (m.topic.input_dim,),
            "img_embs": (m.seq_len, m.image.input_dim),
            "r_embs": (m.seq_len, m.text.input_dim),
        }

    def _validate(self, sample: Dict) -> None:
        """Strict per-key shape check at the edge. Anything less lets one
        bad request poison its window's batch-mates (np.stack raises
        inside the batcher) — or worse, an internally-consistent wrong
        sequence length would trace a brand-new jit program and stall the
        service for the minutes the compile takes."""
        missing = [k for k in SAMPLE_KEYS if k not in sample]
        if missing:
            raise ValueError(f"sample missing keys: {missing}")
        for k, want in self._expected_shapes().items():
            got = np.asarray(sample[k]).shape
            if got != want:
                raise ValueError(f"{k} shape {got} != {want}")

    def _synthetic_sample(self) -> Dict[str, np.ndarray]:
        d, dcfg, m = {}, self.dcfg, self.mcfg
        P = dcfg.topic_prompt_length
        d["topic_ids"] = np.zeros((P,), np.int32)
        d["tpw_attention_mask"] = np.ones((P,), np.int32)
        d["tpw_type_ids"] = np.zeros((P,), np.int32)
        d["topic_emb"] = np.zeros((m.topic.input_dim,), np.float32)
        d["img_embs"] = np.zeros((m.seq_len, m.image.input_dim), np.float32)
        d["r_embs"] = np.zeros((m.seq_len, m.text.input_dim), np.float32)
        return d

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _pack(
        self, reqs: Sequence[_Pending], bucket: int
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Stack request samples and pad to ``bucket`` rows (pad rows
        repeat row 0 with seed 0; their outputs are dropped at demux)."""
        pad = bucket - len(reqs)
        rows = list(reqs) + [reqs[0]] * pad
        batch = {}
        for k in SAMPLE_KEYS:
            dt = np.float32 if k in _FLOAT_KEYS else np.int32
            batch[k] = jnp.asarray(
                np.stack([np.asarray(r.sample[k], dt) for r in rows])
            )
        seeds = jnp.asarray([r.seed for r in reqs] + [0] * pad, jnp.int32)
        return batch, seeds

    def _decode(self, batch, seeds):
        if self.mesh is not None:
            from mmtg_tpu.decoding import generate_sharded

            return generate_sharded(self.params, self.const, self.mcfg,
                                    self.dcfg, self.gcfg, batch, self._rng,
                                    self.mesh, row_seeds=seeds)
        from mmtg_tpu.decoding import generate

        return generate(self.params, self.const, self.mcfg, self.dcfg,
                        self.gcfg, batch, self._rng, row_seeds=seeds)

    def _decode_chunked(self, batch, seeds):
        """Chunked window decode for windows carrying stream subscribers:
        returns the generator of ``[bucket, n]`` device blocks (one
        sentence frame per block). Token-identical to :meth:`_decode` for
        the same inputs — the per-step PRNG folds in the GLOBAL step
        index, so chunking never changes a token (the serve streaming
        contract). The params/const snapshot is the caller's read of
        ``self.params`` — hot-swap safe per window, like ``_decode``."""
        chunk = self.dcfg.sent_frame_length
        if self.mesh is not None:
            from mmtg_tpu.decoding import generate_stream_sharded

            return generate_stream_sharded(
                self.params, self.const, self.mcfg, self.dcfg, self.gcfg,
                batch, self._rng, self.mesh, row_seeds=seeds, chunk=chunk,
            )
        from mmtg_tpu.decoding import generate_stream

        return generate_stream(
            self.params, self.const, self.mcfg, self.dcfg, self.gcfg,
            batch, self._rng, row_seeds=seeds, chunk=chunk,
        )

    def _loop(self) -> None:
        """Batcher thread body: the dispatch loop plus the crash contract.

        Whatever takes the dispatch loop down — the graceful stop
        sentinel or an error that escapes its defensive catches (engine
        death: a poisoned runtime, a BaseException out of the decode
        dispatch) — the ``finally`` releases the collector (its sentinel)
        and fails everything still queued, so no client ever hangs on a
        dead engine and ``stop()`` always joins
        (tests/test_serve.py::test_engine_death_drains_and_restart_serves).
        """
        try:
            self._dispatch_loop()
        except BaseException as e:
            with self._lock:
                self._stats["errors"] += 1
            self._engine_error = e
            raise
        finally:
            self._inflight.put(None)
            # anything still queued fails loudly instead of hanging its
            # client (_fail_queued respects already-cancelled futures —
            # set_exception on one would InvalidStateError this thread)
            self._fail_queued(
                "engine died before decoding this request: "
                f"{self._engine_error!r}" if self._engine_error is not None
                else "service stopped before decoding"
            )

    def _dispatch_loop(self) -> None:
        """Form a window, pack, dispatch the compiled decode and hand the
        in-flight device result to the collector. On the TPU runtime
        dispatch returns immediately, so window N+1 packs and launches
        while window N still decodes (the ``_inflight`` maxsize bounds
        device queueing to 2 windows); the collector owns the blocking
        device→host transfer and future resolution."""
        while True:
            first = self._queue.get()
            if first is None:
                # graceful drain (stop sentinel); _loop's finally fails
                # any straggler that raced in behind the sentinel
                return
            reqs = [first]
            deadline = time.monotonic() + self.max_wait_ms / 1e3
            while len(reqs) < self.buckets[-1]:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    # drain stop sentinel AFTER serving what we have
                    self._queue.put(None)
                    break
                reqs.append(nxt)
            # honor client-side cancellation of still-queued requests (a
            # running window is never interrupted — its slots are shared)
            live = [r for r in reqs
                    if r.future.set_running_or_notify_cancel()]
            if len(live) != len(reqs):
                with self._lock:
                    self._stats["cancelled"] += len(reqs) - len(live)
            reqs = live
            if not reqs:
                continue
            bucket = self._bucket_for(len(reqs))
            try:
                batch, seeds = self._pack(reqs, bucket)
                if any(r.blocks is not None for r in reqs):
                    # a stream subscriber in the window → chunked decode.
                    # Draining the generator here only DISPATCHES the
                    # prefill + chunk programs (device execution is
                    # async); the collector owns the blocking transfers
                    # and fans blocks out as they materialize.
                    tokens = list(self._decode_chunked(batch, seeds))
                else:
                    tokens = self._decode(batch, seeds)  # async on TPU
            except BaseException as e:
                # Exception: one bad window — fail ITS requests, keep
                # serving. BaseException (engine death — a poisoned
                # runtime): fail the in-flight window FIRST (these reqs
                # are already dequeued, so _loop's queue drain can't see
                # them), then let it take the thread down through _loop's
                # crash path.
                with self._lock:
                    self._stats["errors"] += 1
                for r in reqs:
                    r.future.set_exception(e)
                    if r.blocks is not None:
                        r.blocks.put(e)
                if isinstance(e, Exception):
                    continue
                raise
            with self._lock:
                self._inflight_count += 1
                self._last_progress = time.monotonic()  # window formed
            self._inflight.put((reqs, bucket, tokens))

    def _collect_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            reqs, bucket, tokens = item
            if isinstance(tokens, list):
                # chunked window (stream subscribers aboard): materialize
                # block by block, fanning each out to its streams as it
                # lands; one-shot batch-mates get the assembled tokens
                # at the end
                host_blocks = []
                failed = None
                for blk in tokens:
                    try:
                        arr = np.asarray(blk)  # blocks until chunk done
                    except Exception as e:  # pragma: no cover - defensive
                        failed = e
                        break
                    host_blocks.append(arr)
                    with self._lock:
                        self._last_progress = time.monotonic()
                        self._stats["stream_tokens"] += arr.shape[1] * sum(
                            r.blocks is not None for r in reqs
                        )
                    for i, r in enumerate(reqs):
                        if r.blocks is not None:
                            r.blocks.put(arr[i])
                if failed is not None:
                    with self._lock:
                        self._stats["errors"] += 1
                        self._inflight_count -= 1
                        self._last_progress = time.monotonic()
                    for r in reqs:
                        r.future.set_exception(failed)
                        if r.blocks is not None:
                            r.blocks.put(failed)
                    continue
                # reassemble the one-shot view: [START] + concat(blocks)
                # == _decode's tokens (the streaming identity contract)
                from mmtg_tpu.configs import SpecialTokens

                full = np.concatenate(host_blocks, axis=1)
                tokens = np.concatenate(
                    [np.full((full.shape[0], 1), SpecialTokens().start_id,
                             full.dtype), full],
                    axis=1,
                )
            else:
                try:
                    tokens = np.asarray(tokens)  # blocks until decode done
                except Exception as e:  # pragma: no cover - defensive
                    with self._lock:
                        self._stats["errors"] += 1
                        self._inflight_count -= 1
                        self._last_progress = time.monotonic()
                    for r in reqs:
                        r.future.set_exception(e)
                    continue
            now = time.monotonic()
            with self._lock:
                self._inflight_count -= 1
                self._last_progress = now
                self._stats["batches"] += 1
                self._stats["padded_rows"] += bucket - len(reqs)
                self._stats["served"] += len(reqs)
                self._stats["tokens_served"] += len(reqs) * (
                    tokens.shape[1] - 1
                )  # position 0 is the seeded [#START#], not generated
                self._latencies_ms.extend(
                    (now - r.t_submit) * 1e3 for r in reqs
                )
                del self._latencies_ms[:-1000]
            for i, r in enumerate(reqs):
                r.future.set_result(tokens[i])
                if r.blocks is not None:
                    r.blocks.put(None)  # done sentinel


# ---- HTTP front -----------------------------------------------------------


def prometheus_metrics(stats: Dict) -> str:
    """Render ``GenerationService.stats()`` in the Prometheus text
    exposition format (version 0.0.4) for the ``/metrics`` endpoint.

    Monotone counts become counters (``_total``), derived values become
    gauges, and the latency percentiles are exposed summary-style with a
    ``quantile`` label, in seconds per Prometheus naming conventions."""
    counters = {
        "requests": ("requests_total", "Rows accepted by submit()"),
        "batches": ("windows_total", "Decode windows dispatched"),
        "padded_rows": ("padded_rows_total", "Pad rows added to windows"),
        "served": ("served_rows_total", "Rows whose window completed"),
        "tokens_served": ("tokens_served_total", "Generated tokens"),
        "rejected": ("rejected_total", "Rows shed at the queue edge"),
        "cancelled": ("cancelled_total", "Rows cancelled before dispatch"),
        "errors": ("errors_total", "Windows failed in decode/collect"),
        "streams": ("streams_total", "Streaming requests started"),
        "stream_tokens": ("stream_tokens_total",
                          "Tokens delivered over streaming lanes"),
    }
    gauges = {
        "mean_fill": ("window_fill_ratio", "served/(served+padded) rows"),
        "mean_batch": ("window_mean_rows", "Mean served rows per window"),
        "uptime_s": ("uptime_seconds", "Seconds since service start"),
        "tokens_per_s": ("tokens_per_second", "tokens_served/uptime"),
        "pending": ("pending_rows", "Queued + in-flight rows"),
        "stalled_s": ("stalled_seconds",
                      "Seconds without window progress while work pends"),
    }
    lines: list[str] = []
    for key, (name, help_) in counters.items():
        if key in stats:
            lines += [f"# HELP mmtg_{name} {help_}",
                      f"# TYPE mmtg_{name} counter",
                      f"mmtg_{name} {stats[key]}"]
    for key, (name, help_) in gauges.items():
        if key in stats:
            lines += [f"# HELP mmtg_{name} {help_}",
                      f"# TYPE mmtg_{name} gauge",
                      f"mmtg_{name} {stats[key]}"]
    quantiles = [(q, stats[k] / 1e3) for q, k in
                 (("0.5", "p50_latency_ms"), ("0.95", "p95_latency_ms"))
                 if k in stats]
    if quantiles:
        lines += ["# HELP mmtg_request_latency_seconds Submit-to-tokens latency",
                  "# TYPE mmtg_request_latency_seconds summary"]
        lines += [f'mmtg_request_latency_seconds{{quantile="{q}"}} {v}'
                  for q, v in quantiles]
    return "\n".join(lines) + "\n"


class _Handler(BaseHTTPRequestHandler):
    # quiet the default per-request stderr lines
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _json(self, code: int, payload: Dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        svc: GenerationService = self.server.service  # type: ignore[attr-defined]
        if self.path == "/healthz":
            st = svc.stats()
            if st["stalled_s"] > svc.stall_unhealthy_s:
                # engine wedged (decode call never returned — r05 soak
                # finding): report unhealthy so the orchestrator restarts
                self._json(503, {"ok": False, "stalled_s": st["stalled_s"],
                                 "pending": st["pending"]})
            else:
                self._json(200, {"ok": True})
        elif self.path == "/stats":
            self._json(200, svc.stats())
        elif self.path == "/metrics":
            body = prometheus_metrics(svc.stats()).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def _stream_post(self, svc: "GenerationService") -> None:
        """POST /generate_stream — Server-Sent Events: one ``data:`` event
        per decoded block (default one 22-token lyric sentence), then a
        terminal ``{"done": true}`` event. Body as /generate (JSON or
        npz); JSON additionally takes ``chunk`` (tokens per event).
        Token-identical to /generate for the same (sample, seed) —
        ``[START] + concat(event tokens) == /generate's "tokens"``."""
        try:
            n = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(n)
            ctype = self.headers.get("Content-Type", "")
            chunk = None
            if NPZ_CONTENT_TYPE in ctype or body[:4] == _ZIP_MAGIC:
                sample, meta = decode_request_npz(body)
                seed, want_text = meta["seed"], meta["text"]
            else:
                req = json.loads(body or b"{}")
                sample = {k: np.asarray(v) for k, v in req["sample"].items()}
                seed = int(req.get("seed", 0))
                want_text = bool(req.get("text", True))
                if req.get("chunk") is not None:
                    chunk = int(req["chunk"])
            t0 = time.monotonic()
            it = svc.stream(sample, seed, chunk=chunk)
            first = next(it)  # lane acquisition + prefill happen here:
            # errors must surface BEFORE the 200/event-stream header
        except ServiceOverloaded as e:
            self._json(503, {"error": str(e)})
            return
        except (KeyError, ValueError, TypeError, json.JSONDecodeError,
                zipfile.BadZipFile) as e:
            self._json(400, {"error": str(e)})
            return
        except Exception as e:  # pragma: no cover - defensive
            self._json(500, {"error": str(e)})
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()
        tok = getattr(self.server, "tokenizer", None)
        n_tokens = 0

        def emit(block) -> None:
            nonlocal n_tokens
            n_tokens += int(block.size)
            ev: Dict = {"tokens": block.tolist()}
            if tok is not None and want_text:
                from mmtg_tpu.decoding import postprocess_tokens

                ev["text"] = postprocess_tokens(block, tok)
            self.wfile.write(f"data: {json.dumps(ev)}\n\n".encode("utf-8"))
            self.wfile.flush()

        try:
            emit(first)
            for block in it:
                emit(block)
            done = {"done": True, "seed": seed, "tokens_total": n_tokens,
                    "latency_ms": (time.monotonic() - t0) * 1e3}
            self.wfile.write(f"data: {json.dumps(done)}\n\n".encode("utf-8"))
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            pass  # client hung up; the window decodes on for its batch-mates
        finally:
            # ALWAYS close (no-op after exhaustion): the suspended
            # generator holds the request's block queue — close it now
            # rather than when the GC finds it
            it.close()

    def do_POST(self):  # noqa: N802
        svc: GenerationService = self.server.service  # type: ignore[attr-defined]
        if self.path == "/reload":
            # checkpoint hot-swap: in-flight windows finish on the old
            # weights, the next window serves the new ones; no recompiles
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                from mmtg_tpu.generate import load_params

                svc.swap_params(load_params(req["model_path"], svc.mcfg))
                self._json(200, {"ok": True, "model_path": req["model_path"]})
            except (KeyError, ValueError, TypeError,
                    json.JSONDecodeError, FileNotFoundError) as e:
                self._json(400, {"error": str(e)})
            except Exception as e:
                # corrupt .pth / half-written Orbax dir / permissions: a
                # JSON 500 beats a dropped socket for the operator
                self._json(500, {"error": str(e)})
            return
        if self.path == "/generate_stream":
            self._stream_post(svc)
            return
        if self.path != "/generate":
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(n)
            ctype = self.headers.get("Content-Type", "")
            if NPZ_CONTENT_TYPE in ctype or body[:4] == _ZIP_MAGIC:
                sample, meta = decode_request_npz(body)
                seed, want_text = meta["seed"], meta["text"]
                timeout = meta["timeout"]
            else:
                req = json.loads(body or b"{}")
                sample = {k: np.asarray(v) for k, v in req["sample"].items()}
                seed = int(req.get("seed", 0))
                timeout = float(req.get("timeout", 600))
                want_text = bool(req.get("text", True))
            t0 = time.monotonic()
            tokens = svc.generate_sync(sample, seed, timeout=timeout)
            out = {
                "tokens": np.asarray(tokens).tolist(),
                "seed": seed,
                "latency_ms": (time.monotonic() - t0) * 1e3,
            }
            tok = getattr(self.server, "tokenizer", None)
            if tok is not None and want_text:
                from mmtg_tpu.decoding import postprocess_tokens

                out["text"] = postprocess_tokens(tokens, tok)
            self._json(200, out)
        except ServiceOverloaded as e:
            self._json(503, {"error": str(e)})
        except (KeyError, ValueError, TypeError, json.JSONDecodeError,
                zipfile.BadZipFile) as e:
            # malformed JSON, bad shapes, or a truncated/corrupt npz body
            self._json(400, {"error": str(e)})
        except Exception as e:  # pragma: no cover - defensive
            self._json(500, {"error": str(e)})


def serve_http(
    service: GenerationService,
    host: str = "127.0.0.1",
    port: int = 8000,
    tokenizer=None,
) -> ThreadingHTTPServer:
    """Bind the HTTP front (caller runs ``serve_forever``, possibly in a
    thread). ``port=0`` binds an ephemeral port (tests)."""
    httpd = ThreadingHTTPServer((host, port), _Handler)
    httpd.service = service  # type: ignore[attr-defined]
    httpd.tokenizer = tokenizer  # type: ignore[attr-defined]
    return httpd


# ---- CLI ------------------------------------------------------------------


def build_arg_parser():
    import argparse

    from mmtg_tpu.generate import build_arg_parser as gen_parser

    p = gen_parser()
    p.description = "MMTG TPU generation server"
    p.add_argument("--host", default="127.0.0.1", type=str)
    p.add_argument("--port", default=8000, type=int)
    p.add_argument("--buckets", default="8,16,32,64", type=str,
                   help="ascending batch buckets; each compiles once")
    p.add_argument("--max_wait_ms", default=25.0, type=float,
                   help="window the batcher holds open for stragglers")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip compile-ahead of every bucket at startup")
    p.add_argument("--max_queue_depth", default=4096, type=int,
                   help="shed load (HTTP 503) past this many queued requests")
    p.add_argument("--max_streams", default=None, type=int,
                   help="DEPRECATED no-op (kept for CLI compat): streams "
                        "ride the window batcher now — capacity and "
                        "shedding are governed by --max_queue_depth like "
                        "every other request")
    p.add_argument("--stall_unhealthy_s", default=120.0, type=float,
                   help="/healthz turns 503 when work is pending but no "
                        "window formed or completed for this long (a "
                        "decode call that never returns — e.g. a device/"
                        "tunnel stall — is a hang, not a crash; the "
                        "orchestrator should restart on it)")
    return p


def build_service(args, mcfg: ModelConfig | None = None,
                  dcfg: DataConfig | None = None):
    """Everything between parsed args and a started service: tokenizer,
    configs (or the injected tiny test ones), checkpoint, WenLan table,
    bucket parsing. Returns ``(service, tokenizer)`` — split from
    :func:`main` so the CLI wiring is testable without ``serve_forever``."""
    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    from mmtg_tpu.bpe import load_tokenizer
    from mmtg_tpu.data import load_token_embedding_table
    from mmtg_tpu.generate import load_params

    tokenizer = load_tokenizer(args.tokenizer_path)
    if mcfg is None or dcfg is None:
        if args.variant == "english":
            from mmtg_tpu.configs import english_variant

            mcfg, dcfg = english_variant(clip_dim=args.clip_dim,
                                         gpt2_vocab=len(tokenizer))
        else:
            mcfg, dcfg = ModelConfig(), DataConfig()
    buckets = tuple(int(b) for b in args.buckets.split(","))
    # 'auto' weights/cache resolve inside GenerationService.__init__ (once
    # per service, from the largest bucket — see the invariance note there)
    gcfg = GenerateConfig(
        temperature=args.temperature,
        top_k=args.topk,
        top_p=args.topp,
        repetition_penalty=args.repetition_penalty,
        length=dcfg.max_seq_length,
        type_id_scheme=args.type_id_scheme,
        cache_dtype=args.cache_dtype,
        weight_dtype=args.weight_dtype,
        topk_impl=args.topk_impl,
        attn_impl=args.attn_impl,
    )
    mesh = None
    if args.mesh_data != 1 or args.mesh_model != 1:
        # inherited from the generate parser: serve over a (data, model)
        # mesh — GenerationService validates bucket divisibility and
        # row-seed invariance keeps responses mesh-shape independent
        from mmtg_tpu.parallel.mesh import make_mesh

        dp = args.mesh_data or max(len(jax.devices()) // args.mesh_model, 1)
        mesh = make_mesh((dp, args.mesh_model))
    params = load_params(args.model_path, mcfg)
    table = jnp.asarray(load_token_embedding_table(
        args.token_emb_path, len(tokenizer), dcfg.wenlan_emb_size))
    if getattr(args, "max_streams", None) is not None:
        import warnings

        warnings.warn(
            "--max_streams is deprecated and ignored: streams ride the "
            "window batcher (capacity = --max_queue_depth)",
            DeprecationWarning, stacklevel=2,
        )
    service = GenerationService(
        params, {"wenlan_table": table}, mcfg, dcfg, gcfg,
        buckets=buckets,
        max_wait_ms=args.max_wait_ms,
        base_seed=args.seed,
        mesh=mesh,
        max_queue_depth=args.max_queue_depth,
        stall_unhealthy_s=getattr(args, "stall_unhealthy_s", 120.0),
    ).start()
    return service, tokenizer


def main(argv=None, mcfg: ModelConfig | None = None,
         dcfg: DataConfig | None = None) -> None:
    args = build_arg_parser().parse_args(argv)
    from mmtg_tpu.utils.logging import setup_logger

    logger = setup_logger()
    service, tokenizer = build_service(args, mcfg, dcfg)
    if not args.no_warmup:
        logger.info("Warming up buckets %s ...", args.buckets)
        service.warmup()
    httpd = serve_http(service, args.host, args.port, tokenizer=tokenizer)
    logger.info("Serving on http://%s:%d (buckets %s, window %.0f ms)",
                args.host, httpd.server_address[1], args.buckets,
                args.max_wait_ms)
    # SIGTERM (systemd/k8s stop) must drain like Ctrl-C does: raise
    # KeyboardInterrupt out of serve_forever so the finally block runs
    # httpd.shutdown() + service.stop() (stop() serves what's queued —
    # test_stop_serves_already_submitted_requests)
    import signal

    def _sigterm(*_):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.stop()


if __name__ == "__main__":
    main()
