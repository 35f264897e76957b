"""Batched KV-cached generation engine.

Replaces the reference's ``sample_sequence`` (``generate.py:97-145``) —
a batch-1 Python loop that re-forwards the *entire* model over the growing
prefix for every token (O(L³) attention work, no KV cache) — with a single
jitted program: the encoder and topic-prompt prefill run once, then a
``lax.scan`` over 220 fixed steps performs one-token cached decode with
fused repetition-penalty / temperature / ban / top-k / top-p / categorical
sampling, fully batched.

Faithfulness notes (all reference-cited):
  * frame tokens forced at sentence boundaries, ``(i+2) % 22 ∈ {0, 1}``
    (``generate.py:118-122``) — forced tokens still enter the cache, as
    they do implicitly in the reference's full re-forward;
  * PAD begets PAD until the next frame boundary (``generate.py:137-138``);
  * repetition penalty divides seen-token logits unconditionally, once
    PER OCCURRENCE (``generate.py:127-131`` — the tensor-set never
    dedupes), exempting {PAD, SEP};
  * the attention mask masks PAD keys, per-row (the reference's rebuild
    peeks at batch element 0 — ``model.py:311`` — which is equivalent
    only at batch 1; here every row gets its own mask);
  * type ids follow ``GenerateConfig.type_id_scheme`` (SURVEY.md §3.3).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig, SpecialTokens
from mmtg_tpu.models.gpt2 import gpt2_decode_step, prefill_cache
from mmtg_tpu.models.mmtg import (
    decoder_input_embeds,
    encode_experiences,
    infer_scheme_type_ids,
    project_to_gpt2,
    train_scheme_type_ids,
    wenlan_embed,
)
from mmtg_tpu.ops.sampling import frame_forced_token, sample_next_token

SPECIAL = SpecialTokens()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def generate(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    gcfg: GenerateConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    row_seeds: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Generate lyrics for a whole batch in one compiled program (public
    wrapper: normalizes GenerateConfig fields that don't shape the
    compiled program — seed/batch_size/n_samples — so varying them never
    silently recompiles).

    Args:
      row_seeds: optional ``[B]`` int32 per-row seeds. When given, row
        ``b`` samples from its own PRNG stream derived ONLY from
        ``(rng, row_seeds[b], step)`` — so a row's tokens are identical
        no matter which other rows share the batch (the
        batch-composition invariance the serving layer
        (:mod:`mmtg_tpu.serve`) relies on to re-batch concurrent
        requests freely). ``None`` keeps the historical shared-stream
        path bit-for-bit.
    """
    import dataclasses

    gcfg = dataclasses.replace(gcfg, seed=0, batch_size=0, n_samples=0)
    return _generate_jit(params, const, mcfg, dcfg, gcfg, batch, rng, row_seeds)


# expose the jit cache controls (tests use clear_cache)
def _clear_cache():
    _generate_jit.clear_cache()


generate.clear_cache = _clear_cache


def resolve_weight_dtype(gcfg: GenerateConfig, batch_size: int,
                         tp_axis: str | None = None) -> str:
    """The EFFECTIVE decode weight precision. ``'auto'`` → ``'int8'``
    for B ≤ 32: in the latency regime every decode step re-reads the
    full weight set for a handful of rows, so step time ≈ the weight
    read and halving the bytes halves the step (measured:
    tools/bench_latency.py, quality parity in docs/PERF.md). Large
    batches amortize weights across rows → ``'model'`` (int8 was +1-2%
    at b512 but takes the megakernel out of scope).

    Valid under tensor parallelism too: quantization inside the TP
    shard_map pmaxes the row-parallel scales over the model axis
    (``gpt2.quantize_decode_weights(scale_axis=...)``), so the sharded
    int8 decode reproduces the unsharded one and the mesh-shape
    invariance of :func:`generate_sharded` holds. ``tp_axis`` is kept in
    the signature for config-reporting symmetry; it does not change the
    resolution."""
    del tp_axis
    if gcfg.weight_dtype != "auto":
        return gcfg.weight_dtype
    return "int8" if batch_size <= 32 else "model"


def resolve_cache_dtype(gcfg: GenerateConfig, batch_size: int,
                        sharded: bool = False) -> str:
    """The EFFECTIVE KV-cache precision. ``'auto'`` → ``'int8'`` for
    plain single-mesh decode at B ≥ 2; full precision at B = 1 and in
    every sharded context.

    The B = 1 carve-out is perf (see below); the sharded one is a
    mesh-shape-invariance requirement: under tensor parallelism the
    int8 cache's per-row scales are abs-maxed over the LOCAL head shard
    (``quantize_rows`` in the step, or in-kernel on the Pallas path —
    where no cross-shard ``pmax`` is possible), so an int8-cached TP
    decode quantizes differently per mesh shape and its tokens diverge
    from the single-device ones. Weight-only int8 does NOT have this
    problem (its scales ``pmax`` over the model axis,
    ``quantize_decode_weights(scale_axis=...)``). 'auto' therefore
    resolves every meshed run — DP-only included, so the choice cannot
    depend on the mesh's shape — to full precision; explicit
    ``cache_dtype="int8"`` on a mesh stays available (exact on DP-only
    meshes, shard-local quantization under TP — the per-device cache
    shrinks by the TP factor).

    At B = 1 (the xla-attention regime, :func:`resolve_attn_impl`) the
    cache bytes are negligible — the whole 220-step scan streams < 1 GB
    of cache vs ~26 GB of int8 weights — and the step is op-count bound,
    so the int8 cache's per-layer quantize / scale-DUS / dequant chain is
    pure overhead: measured r04 (int8 weights, 220 tok) b1 p50 91.9 ms
    fp cache vs 108.3 int8 cache. From B = 2 the Pallas kernels win and
    the int8 cache's halved streaming pays for its in-kernel quantize
    (b2 103.3 int8 vs 105.9-107.1 fp; the gap widens with B — the b512
    headline NEEDS int8). docs/PERF.md "Round-4 latency regime".

    Like ``weight_dtype='auto'``, the resolution changes sampling
    numerics with batch size, so invariance-sensitive callers pin it
    once: ``generate_sharded`` from the GLOBAL batch,
    ``serve.GenerationService`` from the largest bucket, the generate
    CLI from the nominal ``--batch_size``."""
    if gcfg.cache_dtype != "auto":
        return gcfg.cache_dtype
    if sharded:
        return "model"
    return "model" if batch_size <= 1 else "int8"


def resolve_attn_impl(gcfg: GenerateConfig, d_kv: int,
                      tp_axis: str | None = None,
                      batch_size: int | None = None) -> str:
    """The EFFECTIVE decode-attention implementation after the platform
    and scope gates — the exact resolution ``_generate_jit`` applies.
    Callers that *report* a configuration (bench.py JSON lines) must use
    this, not ``gcfg.attn_impl``: e.g. ``fused`` silently falls back to
    the per-layer kernels outside its scope (int8 split cache,
    full-precision weights, no TP, D % 128 == 0)."""
    attn_impl = gcfg.attn_impl
    if attn_impl == "auto":
        # 'axon' is the remote-TPU platform name on tunneled single chips
        attn_impl = (
            "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
        )
        # Latency regime: at B = 1 the per-layer Pallas kernels lose to
        # plain XLA attention — their fixed per-call DMA-issue cost plus
        # the sublane pad to 8 rows outweigh the kernel's streaming wins
        # (measured r04, int8 weights, 220 tok, p50 ms: b1 103.6 xla vs
        # 106.8 pallas even with the unrolled layer loop, 114.2 rolled).
        # From B = 2 up, pallas + the unrolled layer loop wins (b2 104.4
        # vs 109.2 xla; b4-8 ~100 vs 157-220 — docs/PERF.md "Round-4
        # latency regime"), so the threshold is 1.
        if attn_impl == "pallas" and batch_size is not None and batch_size <= 1:
            attn_impl = "xla"
    # 'auto' cache/weights resolve per batch; without a batch (config-only
    # reporting) assume the large-batch resolutions ('int8' / 'model').
    if batch_size is not None:
        cd = resolve_cache_dtype(gcfg, batch_size,
                                 sharded=tp_axis is not None)
    elif gcfg.cache_dtype == "auto":
        cd = "model" if tp_axis is not None else "int8"
    else:
        cd = gcfg.cache_dtype
    d_store = d_kv // 2 if cd == "int4" else d_kv
    wd = (resolve_weight_dtype(gcfg, batch_size) if batch_size is not None
          else ("model" if gcfg.weight_dtype == "auto" else gcfg.weight_dtype))
    if attn_impl == "fused" and not (
        cd == "int8"
        and not gcfg.merged_kv
        and wd != "int8"
        and tp_axis is None
        and d_kv % 128 == 0
    ):
        # megakernel scope: int8 split cache, full-precision weights, no
        # TP — everything else uses the per-layer kernels
        attn_impl = "pallas"
    if attn_impl == "pallas" and d_store % 128 != 0:
        # Mosaic lane alignment: the decode kernel slices the cache's
        # trailing dim, which must be a 128 multiple (D/2 when
        # int4-packed). TP shards (D/tp) and tiny test models can violate
        # that — fall back to the XLA path there.
        attn_impl = "xla"
    return attn_impl


def resolve_layer_unroll(gcfg: GenerateConfig, n_layer: int,
                         batch_size: int | None = None,
                         attn_impl: str | None = None) -> int:
    """Effective layer-loop unroll for the cached decode step.

    'auto' → full unroll on the PALLAS attention path at decode batches
    ≤ 32. Measured r04 (int8 weights/cache, 220 tok, p50 ms): unrolling
    turns the nested layer while's dynamic indexing + loop-carried
    copies into static slices and lets XLA overlap the per-layer kernel
    calls' fixed DMA-issue cost — pallas b8 113.0 → 99.7, b32 153.7 →
    138.5, b2 123.0 → 104.4; at b512 it is a wash (125.5k vs 125.9k
    tok/s) so the rolled loop keeps its 12× smaller compile. On the XLA
    attention path unrolling LOSES (b1 103.6 rolled → 118.4 unrolled —
    the in-place cache DUS chain schedules worse inlined), so 'auto'
    never unrolls it. docs/PERF.md "Round-4 latency regime".
    Math-identical at any value (same ops, static layer slices)."""
    if gcfg.layer_unroll != "auto":
        return max(1, int(gcfg.layer_unroll))
    if (attn_impl == "pallas" and batch_size is not None
            and batch_size <= 32):
        return n_layer
    return 1


def _pad_to_sublanes(attn_impl, batch, row_seeds):
    """Mosaic sublane alignment: kernel batch blocks must divide into 8s —
    pad ragged batches (e.g. 3 rows × 10 samples = 30 from the generate
    CLI) up to a multiple of 8; callers slice the tokens back at the end.
    Returns ``(batch, row_seeds, orig_B, padded_B)``."""
    B = batch["topic_ids"].shape[0]
    pad_b = (-B) % 8 if attn_impl in ("pallas", "fused") else 0
    if pad_b:
        batch = {
            k: jnp.concatenate([v, jnp.zeros((pad_b,) + v.shape[1:], v.dtype)])
            for k, v in batch.items()
        }
        if row_seeds is not None:
            row_seeds = jnp.concatenate(
                [row_seeds, jnp.zeros((pad_b,), row_seeds.dtype)]
            )
    return batch, row_seeds, B, B + pad_b


def _prefill_state(params, const, mcfg, dcfg, gcfg, batch, attn_impl,
                   weight_dtype, tp_axis):
    """Encoder + topic-prompt prefill + decode-weight prep — everything
    before the per-token loop, shared by the one-shot scan
    (:func:`_generate_jit`) and the chunked streaming path
    (:func:`generate_stream`). ``batch`` must already be sublane-padded.

    Returns ``(state, gpt2_params, fused)`` where
    ``state = (cache, key_mask, tokens, seen, last_logits)`` is the
    decode-loop carry and ``gpt2_params`` are the (possibly int8-
    quantized) decoder weights the loop reads.
    """
    table = const["wenlan_table"]
    B = batch["topic_ids"].shape[0]
    P = dcfg.topic_prompt_length
    V = mcfg.gpt2.vocab_size
    capacity = _round_up(P + gcfg.length + 1, 128)

    # ---- encoder runs ONCE (the reference re-runs it per token) ----------
    fused, _ = encode_experiences(
        params,
        mcfg,
        batch["topic_emb"],
        batch["img_embs"],
        batch["r_embs"],
        # 'pallas' only: the GRU runs once per call (not per token), so the
        # kernel is perf-noise for 'fused', and keeping it off lets the
        # megakernel engine path run in interpret mode on CPU CI.
        use_fused_gru=attn_impl == "pallas",
    )

    # ---- prefill: topic prompt + initial [#START#] ------------------------
    start_tok = jnp.full((B, 1), SPECIAL.start_id, jnp.int32)
    embeds = decoder_input_embeds(
        params, table, dcfg, fused, batch["topic_ids"], start_tok
    )
    type_ids = jnp.concatenate(
        [batch["tpw_type_ids"].astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    attn_mask = jnp.concatenate(
        [batch["tpw_attention_mask"].astype(jnp.int32), jnp.ones((B, 1), jnp.int32)],
        axis=1,
    )
    prefill_logits, cache = prefill_cache(
        params["gpt2"],
        mcfg.gpt2,
        embeds,
        jnp.arange(P + 1)[None, :],
        type_ids,
        attn_mask,
        capacity,
        quantized=gcfg.cache_dtype,
        tp_axis=tp_axis,
    )

    # weight-only int8 for the 220-step decode loop (prefill above ran at
    # full precision); quantization happens ONCE per generate call
    gpt2_params = params["gpt2"]
    if weight_dtype == "int8":
        from mmtg_tpu.models.gpt2 import quantize_decode_weights

        # scale_axis: under TP the row-parallel scales pmax over the
        # model axis so sharded quantization equals the global one
        gpt2_params = quantize_decode_weights(gpt2_params, scale_axis=tp_axis)

    # merged-KV storage: pack k||v into one [L, B, T, 2D] buffer (one
    # tile DMA per kernel sub-tile instead of two; bit-identical —
    # tests/test_decode_attention.py). One concat per generate call,
    # amortized over the 220-step scan. int8 pallas path only; TP shards
    # keep split caches (the head-sharded regroup happens per half).
    from mmtg_tpu.models.gpt2 import KVCache

    if (
        gcfg.merged_kv
        and attn_impl == "pallas"
        and gcfg.cache_dtype == "int8"
        and tp_axis is None
    ):
        cache = KVCache(
            jnp.concatenate([cache.k, cache.v], axis=-1),
            jnp.zeros((0,), cache.k.dtype),  # merged sentinel
            cache.k_scale,
            cache.v_scale,
        )

    key_mask = jnp.zeros((B, capacity), jnp.int32)
    key_mask = jax.lax.dynamic_update_slice(key_mask, attn_mask, (0, 0))

    tokens = jnp.zeros((B, gcfg.length + 1), jnp.int32).at[:, 0].set(
        SPECIAL.start_id
    )
    # occurrence counts (not a bool mask): the reference penalizes once per
    # occurrence — see ops/sampling.apply_repetition_penalty. int16: the
    # [B, V] table is pure HBM traffic in the decode loop (~27 MB/step as
    # s32 for the scatter-add + the penalty read at b512) and counts are
    # bounded by the 221-token target length.
    seen = jnp.zeros((B, V), jnp.int16).at[:, SPECIAL.start_id].set(1)

    state = (cache, key_mask, tokens, seen, prefill_logits[:, -1])
    return state, gpt2_params, fused


def _build_step(params, gpt2_params, table, fused, rng, row_keys, mcfg,
                dcfg, gcfg, attn_impl, unroll, tp_axis):
    """The per-token decode step shared by the one-shot scan and the
    chunked streaming path. ``i`` is the GLOBAL step index — the PRNG
    stream is ``fold_in(rng, i)`` (or per-row ``fold_in(row_key, i)``),
    so any chunking of the step sequence is bit-identical to the single
    scan over ``arange(length)``."""
    scheme = (
        infer_scheme_type_ids
        if gcfg.type_id_scheme == "reference_infer"
        else train_scheme_type_ids
    )
    P = dcfg.topic_prompt_length
    # fused window id per target position j: j // 44, clamped; no addition
    # past the last window (model.py:267-268).
    win = dcfg.two_sents_length
    T_steps = fused.shape[1]

    def step(carry, i, window):
        cache, key_mask, tokens, seen, last_logits = carry
        B = tokens.shape[0]
        # --- choose token for target position j = i + 1 ---
        is_forced, forced_id = frame_forced_token(i, dcfg.sent_frame_length)
        step_rng = (
            jax.random.fold_in(rng, i)
            if row_keys is None
            else jax.vmap(lambda k: jax.random.fold_in(k, i))(row_keys)
        )
        last_token = jax.lax.dynamic_slice(tokens, (0, i), (B, 1))[:, 0]
        sampled = sample_next_token(
            step_rng,
            last_logits,
            seen,
            last_token,
            temperature=gcfg.temperature,
            top_k=gcfg.top_k,
            top_p=gcfg.top_p,
            repetition_penalty=gcfg.repetition_penalty,
            topk_impl=gcfg.topk_impl,
            per_row_keys=row_keys is not None,
        )
        tok = jnp.where(is_forced, forced_id, sampled)  # [B]
        j = i + 1
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, j))
        seen = seen.at[jnp.arange(B), tok].add(1)

        # --- embed the new token and extend the cache ---
        wl = wenlan_embed(table, tok)  # [B, 2048]
        w_idx = jnp.minimum(j // win, T_steps - 1)
        add = jnp.where(j < win * T_steps, 1.0, 0.0)
        wl = wl + add * fused[:, w_idx]
        x = project_to_gpt2(params, wl)
        tt = scheme(j[None], tok, dcfg)  # [B]
        not_pad = (tok != SPECIAL.pad_id).astype(jnp.int32)
        key_mask = jax.lax.dynamic_update_slice(key_mask, not_pad[:, None], (0, P + j))
        logits, cache = gpt2_decode_step(
            gpt2_params, mcfg.gpt2, cache, x, P + j, tt, key_mask,
            window=window, attn_impl=attn_impl, tp_axis=tp_axis,
            unroll=unroll,
        )
        return (cache, key_mask, tokens, seen, logits), None

    return step


def _row_keys(rng, row_seeds):
    # Per-row streams: key(b, i) = fold_in(fold_in(rng, row_seeds[b]), i)
    # depends on nothing batch-shaped, so a row's sample path is invariant
    # to which other rows got batched with it (serving re-batches freely).
    if row_seeds is None:
        return None
    return jax.vmap(lambda s: jax.random.fold_in(rng, s))(row_seeds)


@partial(
    jax.jit,
    static_argnames=("mcfg", "dcfg", "gcfg", "tp_axis"),
)
def _generate_jit(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    gcfg: GenerateConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    row_seeds: jnp.ndarray | None = None,
    tp_axis: str | None = None,
) -> jnp.ndarray:
    """Generate lyrics for a whole batch in one compiled program.

    Args:
      batch: reference-keyed arrays (``topic_ids``, ``tpw_*``,
        ``topic_emb``, ``img_embs``, ``r_embs``); targets are generated.
      rng: PRNG key; one independent stream per decode step.
      row_seeds: optional ``[B]`` int32 — per-row PRNG streams (see
        :func:`generate`).
    Returns:
      ``[B, 1 + length]`` int32 token ids, position 0 = ``[#START#]``
      (the reference seeds generation with a bare START, ``generate.py:208-210``).
    """
    import dataclasses

    B = batch["topic_ids"].shape[0]
    if gcfg.cache_dtype == "auto":
        gcfg = dataclasses.replace(
            gcfg,
            cache_dtype=resolve_cache_dtype(gcfg, B,
                                            sharded=tp_axis is not None),
        )
    d_kv = params["gpt2"]["h"]["attn_w"].shape[-1] // 3
    attn_impl = resolve_attn_impl(gcfg, d_kv, tp_axis, batch_size=B)
    weight_dtype = resolve_weight_dtype(gcfg, B, tp_axis)
    unroll = resolve_layer_unroll(
        gcfg, mcfg.gpt2.n_layer, batch_size=B, attn_impl=attn_impl
    )
    batch, row_seeds, orig_B, B = _pad_to_sublanes(attn_impl, batch, row_seeds)

    state, gpt2_params, fused = _prefill_state(
        params, const, mcfg, dcfg, gcfg, batch, attn_impl, weight_dtype,
        tp_axis,
    )
    step = _build_step(
        params, gpt2_params, const["wenlan_table"], fused, rng,
        _row_keys(rng, row_seeds), mcfg, dcfg, gcfg, attn_impl, unroll,
        tp_axis,
    )

    # Single scan over all steps at full window. (A static-window segmented
    # variant was measured slower — XLA materializes the cache prefix slice
    # as a copy instead of narrowing the reads; true dynamic-length reads
    # live in the Pallas decode-attention kernel.)
    state, _ = jax.lax.scan(
        partial(step, window=None), state, jnp.arange(gcfg.length)
    )
    tokens = state[2]
    return tokens[:orig_B] if orig_B != B else tokens


@partial(
    jax.jit,
    static_argnames=("mcfg", "dcfg", "gcfg", "attn_impl", "weight_dtype",
                     "tp_axis"),
)
def _prefill_stream_jit(params, const, mcfg, dcfg, gcfg, batch, attn_impl,
                        weight_dtype, tp_axis):
    return _prefill_state(
        params, const, mcfg, dcfg, gcfg, batch, attn_impl, weight_dtype,
        tp_axis,
    )


@partial(
    jax.jit,
    static_argnames=("mcfg", "dcfg", "gcfg", "chunk", "attn_impl", "unroll",
                     "tp_axis"),
    donate_argnums=(4,),
)
def _stream_chunk_jit(params, gpt2_params, table, fused, state, rng,
                      row_seeds, start, mcfg, dcfg, gcfg, chunk, attn_impl,
                      unroll, tp_axis):
    """Run ``chunk`` decode steps starting at GLOBAL step ``start``.

    ``start`` is a traced scalar — every chunk of a given size reuses one
    compiled program (the per-step PRNG folds in the global index, and all
    cache/token writes are dynamic slices at ``start``-relative positions,
    so nothing about the computation is offset-dependent). ``state`` is
    DONATED: without it every chunk call would copy the full KV cache
    once before its in-place scan updates (callers never reuse the old
    state; on backends without donation support this is a no-op warning)."""
    step = _build_step(
        params, gpt2_params, table, fused, rng, _row_keys(rng, row_seeds),
        mcfg, dcfg, gcfg, attn_impl, unroll, tp_axis,
    )

    def step_tok(carry, i):
        carry, _ = step(carry, i, window=None)
        B = carry[2].shape[0]
        tok = jax.lax.dynamic_slice(carry[2], (0, i + 1), (B, 1))[:, 0]
        return carry, tok

    state, toks = jax.lax.scan(step_tok, state, start + jnp.arange(chunk))
    return state, toks.T  # [B, chunk]


def generate_stream(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    gcfg: GenerateConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    row_seeds: jnp.ndarray | None = None,
    chunk: int | None = None,
):
    """Streaming generation: yield ``[B, chunk]`` token blocks as they are
    decoded, bit-identical to :func:`generate`.

    The reference has no streaming at all (its ``sample_sequence`` loop,
    ``generate.py:97-145``, prints only after the full lyric); this is a
    serving capability: the prefill compiles once, then ONE compiled
    chunk program (traced ``start`` scalar) is re-dispatched per block, so
    time-to-first-sentence ≈ prefill + one chunk instead of the full
    220-step scan. Bit-identity with the one-shot path holds because the
    per-step PRNG stream is keyed on the GLOBAL step index
    (see :func:`_build_step`), verified by
    ``tests/test_decoding.py::test_generate_stream_matches_generate``.

    Args:
      chunk: steps per yielded block; defaults to ``dcfg.sent_frame_length``
        (22 — one lyric sentence per block). A ragged final block (when
        ``chunk`` doesn't divide ``gcfg.length``) costs one extra compile.
      row_seeds: as in :func:`generate` — per-row PRNG streams, so a
        streamed row is invariant to its batch companions.

    Yields:
      ``[B, n]`` int32 device arrays (``n == chunk`` except possibly the
      last). Concatenated, they equal ``generate(...)[:, 1:]`` (the
      one-shot output minus the seeded ``[#START#]`` column). Single-mesh
      only — the sharded path (:func:`generate_sharded`) stays one-shot.
    """
    import dataclasses

    gcfg = dataclasses.replace(gcfg, seed=0, batch_size=0, n_samples=0)
    B = batch["topic_ids"].shape[0]
    if gcfg.cache_dtype == "auto":
        gcfg = dataclasses.replace(
            gcfg, cache_dtype=resolve_cache_dtype(gcfg, B)
        )
    d_kv = params["gpt2"]["h"]["attn_w"].shape[-1] // 3
    attn_impl = resolve_attn_impl(gcfg, d_kv, None, batch_size=B)
    weight_dtype = resolve_weight_dtype(gcfg, B, None)
    unroll = resolve_layer_unroll(
        gcfg, mcfg.gpt2.n_layer, batch_size=B, attn_impl=attn_impl
    )
    if chunk is None:
        chunk = dcfg.sent_frame_length
    chunk = max(1, min(int(chunk), gcfg.length))
    batch, row_seeds, orig_B, _ = _pad_to_sublanes(attn_impl, batch, row_seeds)
    state, gpt2_params, fused = _prefill_stream_jit(
        params, const, mcfg, dcfg, gcfg, batch, attn_impl, weight_dtype,
        None,
    )
    table = const["wenlan_table"]
    start = 0
    while start < gcfg.length:
        n = min(chunk, gcfg.length - start)
        state, toks = _stream_chunk_jit(
            params, gpt2_params, table, fused, state, rng, row_seeds,
            jnp.int32(start), mcfg, dcfg, gcfg, n, attn_impl, unroll, None,
        )
        yield toks[:orig_B]
        start += n


def teacher_forced_decode_logits(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    gcfg: GenerateConfig,
    batch: Dict[str, jnp.ndarray],
    tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Per-step logits of the KV-cached decode engine under teacher
    forcing: feed ``tokens`` (``[B, K]``, position 0 = ``[#START#]``)
    through the SAME prefill + per-token cached step the sampler uses, and
    return ``[B, K, V]`` where row ``j`` is the next-token distribution
    after consuming ``tokens[:, :j+1]``.

    This is the parity surface for the reference's decode-time cost
    center: one cached step here must produce the logits the reference
    gets from a FULL re-forward of the growing prefix per token
    (``generate.py:117-124`` calls the inference branch
    ``model.py:291-326`` once per position). Compare against
    :func:`mmtg_tpu.oracle.oracle_forward_infer` at each prefix length.
    """
    import dataclasses

    table = const["wenlan_table"]
    scheme = (
        infer_scheme_type_ids
        if gcfg.type_id_scheme == "reference_infer"
        else train_scheme_type_ids
    )
    B, K = tokens.shape
    if gcfg.cache_dtype == "auto":
        gcfg = dataclasses.replace(
            gcfg, cache_dtype=resolve_cache_dtype(gcfg, B)
        )
    P = dcfg.topic_prompt_length
    capacity = _round_up(P + K + 1, 128)

    fused, _ = encode_experiences(
        params, mcfg, batch["topic_emb"], batch["img_embs"], batch["r_embs"],
        use_fused_gru=False,
    )
    embeds = decoder_input_embeds(
        params, table, dcfg, fused, batch["topic_ids"], tokens[:, :1]
    )
    type_ids = jnp.concatenate(
        [batch["tpw_type_ids"].astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)],
        axis=1,
    )
    attn_mask = jnp.concatenate(
        [batch["tpw_attention_mask"].astype(jnp.int32), jnp.ones((B, 1), jnp.int32)],
        axis=1,
    )
    prefill_logits, cache = prefill_cache(
        params["gpt2"], mcfg.gpt2, embeds, jnp.arange(P + 1)[None, :],
        type_ids, attn_mask, capacity, quantized=gcfg.cache_dtype,
    )
    key_mask = jnp.zeros((B, capacity), jnp.int32)
    key_mask = jax.lax.dynamic_update_slice(key_mask, attn_mask, (0, 0))

    win = dcfg.two_sents_length
    T_steps = fused.shape[1]
    out = [prefill_logits[:, -1]]
    for j in range(1, K):
        tok = tokens[:, j]
        wl = wenlan_embed(table, tok)
        w_idx = jnp.minimum(j // win, T_steps - 1)
        add = jnp.where(j < win * T_steps, 1.0, 0.0)
        wl = wl + add * fused[:, w_idx]
        x = project_to_gpt2(params, wl)
        tt = scheme(jnp.asarray(j)[None], tok, dcfg)
        not_pad = (tok != SPECIAL.pad_id).astype(jnp.int32)
        key_mask = jax.lax.dynamic_update_slice(
            key_mask, not_pad[:, None], (0, P + j)
        )
        logits, cache = gpt2_decode_step(
            params["gpt2"], mcfg.gpt2, cache, x, P + j, tt, key_mask,
            attn_impl="xla",
        )
        out.append(logits)
    return jnp.stack(out, axis=1)


def postprocess_tokens(token_ids, tokenizer) -> str:
    """Host-side cleanup of one generated row (``generate.py:222-235``):
    cut at the 10th ``[#EOS#]`` (or first ``[SEP]``), strip specials,
    join sentences with '，'.

    Vocab-aware: WordPiece (Chinese) content tokens concatenate directly;
    byte-level BPE (English variant) content tokens are byte-unicode
    symbols and decode through the tokenizer's ``byte_decoder`` so the
    output is readable text, not the BPE alphabet."""
    toks = tokenizer.convert_ids_to_tokens([int(t) for t in token_ids])
    eos_idx = [i for i, v in enumerate(toks) if v == "[#EOS#]"]
    if len(eos_idx) >= 10 and "[SEP]" not in toks[: eos_idx[-1]]:
        toks = toks[: eos_idx[9] + 1] + ["[SEP]"]
    elif "[SEP]" in toks:
        toks = toks[: toks.index("[SEP]") + 1]
    else:
        toks = toks + ["[SEP]"]
    byte_decoder = getattr(tokenizer, "byte_decoder", None)

    def join(chunk):
        s = "".join(chunk)
        if byte_decoder is None:
            return s
        return bytes(
            byte_decoder[c] for c in s if c in byte_decoder
        ).decode("utf-8", errors="replace")

    sents, cur = [], []
    for t in toks:
        if t == "[#EOS#]":
            sents.append(join(cur))
            cur = []
        elif t not in ("[SEP]", "[PAD]", "[#START#]"):
            cur.append(t)
    if cur:
        sents.append(join(cur))
    while sents and not sents[-1]:
        sents.pop()
    return "，".join(sents)


def _resolve_sharded_gcfg(params, mcfg, gcfg, global_b: int, tp: int):
    """Pin every 'auto' resolution from the GLOBAL batch for a meshed run
    (inside the shard_map each data shard would only see batch/dp rows,
    flipping the 32-row weight threshold / the ≤2-row xla-attention gate
    with mesh shape — the outputs must not). Shared by
    :func:`generate_sharded` and :func:`generate_stream_sharded`."""
    import dataclasses

    from mmtg_tpu.parallel.mesh import MODEL_AXIS

    if gcfg.cache_dtype == "auto":
        # every meshed decode resolves fp (resolve_cache_dtype docstring:
        # the resolution must not depend on the mesh shape, and int8 is
        # not TP-invariant)
        gcfg = dataclasses.replace(
            gcfg, cache_dtype=resolve_cache_dtype(gcfg, global_b,
                                                  sharded=True)
        )
    if gcfg.weight_dtype == "auto":
        gcfg = dataclasses.replace(
            gcfg, weight_dtype=resolve_weight_dtype(gcfg, global_b)
        )
    if gcfg.attn_impl == "auto":
        d_kv = params["gpt2"]["h"]["attn_w"].shape[-1] // 3
        gcfg = dataclasses.replace(
            gcfg,
            attn_impl=resolve_attn_impl(
                gcfg, d_kv,
                MODEL_AXIS if tp > 1 else None,
                batch_size=global_b,
            ),
        )
    if gcfg.layer_unroll == "auto":
        # gcfg.attn_impl is concrete by now (replaced above when 'auto');
        # a per-shard pallas→xla %128 fallback downstream would leave an
        # unrolled xla step — slower, but math-identical, so mesh-shape
        # output invariance still holds.
        gcfg = dataclasses.replace(
            gcfg,
            layer_unroll=str(resolve_layer_unroll(
                gcfg, mcfg.gpt2.n_layer, batch_size=global_b,
                attn_impl=gcfg.attn_impl,
            )),
        )
    return gcfg


def generate_sharded(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    gcfg: GenerateConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    mesh,
    row_seeds: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Data×tensor-parallel generation over a device mesh.

    Each ``data``-axis shard decodes its local batch slice (the per-shard
    RNG folds in the data index so rows sample independently). When the
    mesh's ``model`` axis is >1, the GPT-2 decoder runs Megatron-style
    tensor-parallel within each data shard: head-aligned QKV/MLP-fc
    column shards, row-parallel projections with a ``psum`` over ICI, and
    the KV cache sharded over heads — so the per-device cache (the decode
    loop's dominant HBM traffic) shrinks by the TP factor. The reference's
    only scale-out is single-process ``nn.DataParallel``
    (``generate.py:191``).

    With ``row_seeds`` (``[B]`` int32, sharded over the data axis) each
    row samples from a stream derived only from ``(rng, row_seeds[b],
    step)`` — no data-axis fold — so tokens are identical to the
    single-device :func:`generate` row for row and invariant to mesh
    shape: the serving layer scales over a mesh without changing any
    response.
    """
    import dataclasses

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mmtg_tpu.parallel.mesh import (
        DATA_AXIS,
        MODEL_AXIS,
        decode_param_pspecs,
        tp_decode_params,
    )

    tp = mesh.shape[MODEL_AXIS]
    # 'auto' resolutions pin from the GLOBAL batch (_resolve_sharded_gcfg).
    # The per-shard Mosaic %128 lane gate in resolve_attn_impl still
    # applies to the concrete value downstream (TP shards with d_kv/tp not
    # 128-aligned fall back to the XLA path regardless).
    global_b = batch["topic_ids"].shape[0]
    gcfg = _resolve_sharded_gcfg(params, mcfg, gcfg, global_b, tp)
    batch_spec = {k: P(DATA_AXIS) for k in batch}
    seed_specs = () if row_seeds is None else (P(DATA_AXIS),)
    seed_args = () if row_seeds is None else (row_seeds,)

    if tp == 1:
        def local_generate(params, const, batch, rng, row_seeds=None):
            if row_seeds is None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            return generate(params, const, mcfg, dcfg, gcfg, batch, rng,
                            row_seeds=row_seeds)

        local_fn, param_specs = local_generate, P()
    else:
        # --- DP × TP -------------------------------------------------------
        gcfg = dataclasses.replace(gcfg, seed=0, batch_size=0, n_samples=0)
        params = tp_decode_params(
            params, mcfg.gpt2.n_head, mcfg.gpt2.head_dim, tp
        )
        param_specs = decode_param_pspecs(params)

        def local_generate_tp(params, const, batch, rng, row_seeds=None):
            # same rng for all model shards of a data slice (they must
            # sample identical tokens); independent per data shard — via
            # the data-axis fold, or per-row streams when row_seeds drive
            # the sampling
            if row_seeds is None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            return _generate_jit(
                params, const, mcfg, dcfg, gcfg, batch, rng, row_seeds,
                tp_axis=MODEL_AXIS,
            )

        local_fn = local_generate_tp

    # Place every input at the EXACT sharding the shard_map expects before
    # the call. Callers routinely hand in params living at some other
    # layout (e.g. the train step's shardings in the dryrun/eval flow);
    # letting the partitioner reconcile that inside the compiled program
    # triggers "[SPMD] Involuntary full rematerialization" — a
    # replicate-then-repartition of the tensor on EVERY call, wasted
    # HBM + ICI on real hardware (VERDICT r04 weak #3). An explicit
    # device_put does the reshard once, out-of-graph, so the decode
    # program compiles clean.
    from jax.sharding import NamedSharding

    def _put(tree, specs):
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(tree, shardings)

    params = _put(params, param_specs)
    const = _put(const, P())
    batch = _put(batch, batch_spec)
    rng = _put(rng, P())
    seed_args = tuple(_put(s, P(DATA_AXIS)) for s in seed_args)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(param_specs, P(), batch_spec, P()) + seed_specs,
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return fn(params, const, batch, rng, *seed_args)


# Compiled program cache for the sharded streaming path: the serving layer
# dispatches one prefill + ~10 chunk programs per streamed window, so the
# shard_map-wrapped jits must be BUILT once per (mesh, configs, chunk
# size) and reused — a fresh jax.jit object per call would retrace every
# window. Keys are hashable (Mesh hashes on devices+axes, the configs are
# frozen dataclasses).
_STREAM_SHARDED_FNS: Dict = {}


def _stream_sharded_clear_cache():
    _STREAM_SHARDED_FNS.clear()


def generate_stream_sharded(
    params: Dict,
    const: Dict,
    mcfg: ModelConfig,
    dcfg: DataConfig,
    gcfg: GenerateConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    mesh,
    row_seeds: jnp.ndarray | None = None,
    chunk: int | None = None,
):
    """Streaming generation over a DP×TP device mesh: yield ``[B, chunk]``
    token blocks as they decode, bit-identical to :func:`generate_sharded`
    (and — with ``row_seeds`` — to the single-device :func:`generate`).

    The decode state (KV cache, tokens, seen-counts) lives ON-MESH between
    chunk calls: the prefill shard_map returns it sharded (cache batch
    over ``data``, head dim over ``model`` under TP) and each chunk
    program takes/returns it at the same shardings, so streaming adds no
    host round-trip of state — only the yielded ``[B, chunk]`` token
    blocks cross to host. This is what lets the serving layer pack
    streamed requests into ordinary batched windows on meshed services
    instead of running them on dedicated batch-1 lanes.

    Constraints: the global batch must divide by the mesh's data axis
    (same as :func:`generate_sharded`); an explicitly quantized KV cache
    under TP (>1 model shards) is rejected — its shard-local scales
    cannot cross the chunk boundary as a named sharding (the 'auto'
    resolution on any mesh is full precision, which streams fine).
    """
    import dataclasses

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmtg_tpu.models.gpt2 import KVCache
    from mmtg_tpu.parallel.mesh import (
        DATA_AXIS,
        MODEL_AXIS,
        decode_param_pspecs,
        tp_decode_params,
    )

    tp = mesh.shape[MODEL_AXIS]
    tp_axis = MODEL_AXIS if tp > 1 else None
    global_b = batch["topic_ids"].shape[0]
    gcfg = dataclasses.replace(gcfg, seed=0, batch_size=0, n_samples=0)
    gcfg = _resolve_sharded_gcfg(params, mcfg, gcfg, global_b, tp)
    if tp > 1 and gcfg.cache_dtype in ("int8", "int4"):
        raise ValueError(
            "generate_stream_sharded: a quantized KV cache under tensor "
            "parallelism is not streamable (shard-local scales cannot "
            "cross the chunk boundary as a named sharding); use "
            "cache_dtype='model' (the sharded 'auto' resolution) or a "
            "DP-only mesh"
        )
    if chunk is None:
        chunk = dcfg.sent_frame_length
    chunk = max(1, min(int(chunk), gcfg.length))

    if tp > 1:
        params = tp_decode_params(
            params, mcfg.gpt2.n_head, mcfg.gpt2.head_dim, tp
        )
        param_specs = decode_param_pspecs(params)
    else:
        param_specs = P()
    batch_spec = {k: P(DATA_AXIS) for k in batch}
    has_seeds = row_seeds is not None
    seed_specs = (P(DATA_AXIS),) if has_seeds else ()
    seed_args = (row_seeds,) if has_seeds else ()

    # effective per-shard attention/unroll: the local head shard D/tp can
    # demote pallas → xla via the %128 lane gate, exactly as
    # _generate_jit would resolve from its local param shapes
    attn_local = resolve_attn_impl(
        gcfg, mcfg.gpt2.n_embd // tp, tp_axis, batch_size=global_b
    )
    unroll = resolve_layer_unroll(
        gcfg, mcfg.gpt2.n_layer, batch_size=global_b, attn_impl=attn_local
    )
    quantized = gcfg.cache_dtype in ("int8", "int4")
    merged = (
        gcfg.merged_kv
        and attn_local == "pallas"
        and gcfg.cache_dtype == "int8"
        and tp_axis is None
    )
    kd = P(None, DATA_AXIS, None, tp_axis)
    cache_spec = KVCache(
        k=kd,
        v=(P() if merged else kd),  # merged sentinel v is a [0] array
        k_scale=(P(None, DATA_AXIS, None) if quantized else None),
        v_scale=(P(None, DATA_AXIS, None) if quantized else None),
    )
    state_specs = (cache_spec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                   P(DATA_AXIS))

    def local_prefill(params, const, batch, *seed_args):
        rs = seed_args[0] if seed_args else None
        b, rs, _, _ = _pad_to_sublanes(attn_local, batch, rs)
        state, _, _ = _prefill_state(
            params, const, mcfg, dcfg, gcfg, b, attn_local,
            gcfg.weight_dtype, tp_axis,
        )
        return state

    def make_local_chunk(n: int):
        def local_chunk(params, const, batch, state, rng, start, *seed_args):
            rs = seed_args[0] if seed_args else None
            b, rs, orig_b, _ = _pad_to_sublanes(attn_local, batch, rs)
            if rs is None:
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(DATA_AXIS)
                )
            # the encoder re-run + (optional) weight re-quantization per
            # chunk are one 5-step GRU and one pass over the decoder
            # weights — noise next to the n-step scan, and they keep the
            # cross-chunk state down to the decode carry alone
            fused, _ = encode_experiences(
                params, mcfg, b["topic_emb"], b["img_embs"], b["r_embs"],
                use_fused_gru=attn_local == "pallas",
            )
            gpt2_params = params["gpt2"]
            if gcfg.weight_dtype == "int8":
                from mmtg_tpu.models.gpt2 import quantize_decode_weights

                gpt2_params = quantize_decode_weights(
                    gpt2_params, scale_axis=tp_axis
                )
            step = _build_step(
                params, gpt2_params, const["wenlan_table"], fused, rng,
                _row_keys(rng, rs), mcfg, dcfg, gcfg, attn_local, unroll,
                tp_axis,
            )

            def step_tok(carry, i):
                carry, _ = step(carry, i, window=None)
                Bp = carry[2].shape[0]
                tok = jax.lax.dynamic_slice(
                    carry[2], (0, i + 1), (Bp, 1)
                )[:, 0]
                return carry, tok

            state2, toks = jax.lax.scan(
                step_tok, state, start + jnp.arange(n)
            )
            return state2, toks.T[:orig_b]

        return local_chunk

    def build_prefill():
        return jax.jit(shard_map(
            local_prefill,
            mesh=mesh,
            in_specs=(param_specs, P(), batch_spec) + seed_specs,
            out_specs=state_specs,
            check_vma=False,
        ))

    def build_chunk(n: int):
        # state (arg 3) is donated — same rationale as _stream_chunk_jit:
        # the chunk's in-place cache scan must not pay a full cache copy
        return jax.jit(shard_map(
            make_local_chunk(n),
            mesh=mesh,
            in_specs=(param_specs, P(), batch_spec, state_specs, P(), P())
            + seed_specs,
            out_specs=(state_specs, P(DATA_AXIS)),
            check_vma=False,
        ), donate_argnums=(3,))

    base_key = (mesh, mcfg, dcfg, gcfg, has_seeds, global_b)
    prefill_fn = _STREAM_SHARDED_FNS.get((base_key, "prefill"))
    if prefill_fn is None:
        prefill_fn = _STREAM_SHARDED_FNS[(base_key, "prefill")] = (
            build_prefill()
        )

    # place inputs at the exact in_specs shardings (same rationale as
    # generate_sharded: an in-graph reshard is an involuntary-remat per
    # call; device_put does it once, out-of-graph)
    def _put(tree, specs):
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        return jax.device_put(tree, shardings)

    params = _put(params, param_specs)
    const = _put(const, P())
    batch = _put(batch, batch_spec)
    rng = _put(rng, P())
    seed_args = tuple(_put(s, P(DATA_AXIS)) for s in seed_args)

    state = prefill_fn(params, const, batch, *seed_args)
    start = 0
    while start < gcfg.length:
        n = min(chunk, gcfg.length - start)
        chunk_fn = _STREAM_SHARDED_FNS.get((base_key, "chunk", n))
        if chunk_fn is None:
            chunk_fn = _STREAM_SHARDED_FNS[(base_key, "chunk", n)] = (
                build_chunk(n)
            )
        state, toks = chunk_fn(
            params, const, batch, state, rng, jnp.int32(start), *seed_args
        )
        yield toks
        start += n
