"""GPT-2 decoder as pure JAX functions over a stacked-layer param pytree.

Numerically matches the HF ``GPT2LMHeadModel`` the reference drives through
``inputs_embeds`` / ``token_type_ids`` / ``attention_mask`` / ``labels``
(reference ``model.py:219``, ``:282-288``): learned position embeddings,
token-type ids embedded with the *word* embedding matrix, pre-LN blocks
with fused-QKV projections, ``gelu_new`` MLPs, final LN, weight-tied head.

TPU-first design decisions:
  * per-layer params are stacked on a leading ``[L, ...]`` axis and the
    block is applied with ``lax.scan`` — one compiled block body instead
    of 12 unrolled ones (faster compiles, identical math);
  * masks are additive ``float`` biases so causal + padding combine into
    one tensor op;
  * a fixed-capacity KV cache (``[L, B, H, T_max, hd]``) supports the
    single-token decode step used by the KV-cached generation loop that
    replaces the reference's full re-forward per token
    (``generate.py:117-124``).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from mmtg_tpu.configs import GPT2Config

NEG_INF = -1e30

# Selective rematerialization menu for the train forward. Full-block remat
# re-runs the whole layer in the backward (+1 fwd of FLOPs, ~25% of the
# step); each policy instead SAVES the named matmul outputs and recomputes
# only the cheap glue. Measured b256×236 bf16 on one v5e chip — see
# docs/PERF.md. HBM cost per layer (bf16): qkv 600 MB, attn_ctx 200 MB,
# mlp_fc1 400 MB.
_REMAT_POLICIES = {
    "full": None,  # save only the block input (lowest memory)
    # save attention in/out; recompute MLP fc1 + gelu in the backward
    "save_qkv_ctx": ("qkv", "attn_ctx"),
    # save the cheap-to-store pair; backward recomputes only the QKV
    # projection (the attention kernel itself is skipped — ctx is saved)
    "save_ctx_fc1": ("attn_ctx", "mlp_fc1"),
    # save everything expensive; backward recomputes LN/gelu/dropout only
    # (OOMs at b256×236 on a 16G chip — needs ~19.5G; fine at b≤128)
    "save_all": ("qkv", "attn_ctx", "mlp_fc1"),
}


def _remat_block(block, remat: bool, remat_policy: str):
    if not remat:
        return block
    names = _REMAT_POLICIES[remat_policy]
    if names is None:
        return jax.checkpoint(block)
    return jax.checkpoint(
        block, policy=jax.checkpoint_policies.save_only_these_names(*names)
    )


class KVCache(NamedTuple):
    """Fixed-capacity KV cache, laid out ``[L, B, T_max, D]`` with the head
    dim merged into D = H·hd: time-tile slices are then single contiguous
    DMA runs for the Pallas decode-attention kernel, and the per-step
    write is one contiguous D-row per sample. (Layouts with hd=64 as the
    trailing dim get lane-padded to 128 by Mosaic and rejected for
    slicing; ``[.., hd, T]`` layouts degrade DMA to 256-byte runs.)

    Optionally quantized (``k_scale``/``v_scale`` set): per-row abs-max
    scales. int8 halves the decode loop's dominant HBM traffic; int4
    packs two nibbles per byte (trailing dim D/2 — detected by shape) and
    quarters it."""

    k: jnp.ndarray  # [L, B, T_max, D] (float/int8) or [L, B, T_max, D/2] (int4 packed)
    v: jnp.ndarray  # same
    k_scale: Optional[jnp.ndarray] = None  # [L, B, T_max] f32 (quantized modes)
    v_scale: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8 quantization over the last axis.

    Returns (values int8 ``[...]``, scales f32 ``[...-1 dims]``)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_rows_int4(x: jnp.ndarray):
    """Symmetric per-row int4 quantization, two nibbles packed per byte.

    Packed byte ``j`` holds original element ``j`` (low nibble) and
    element ``j + D/2`` (high nibble), so unpacking is two shifts and a
    lane-half split — no interleaving relayouts anywhere. Values live in
    [-7, 7] (symmetric; -8 unused).

    Returns (packed int8 ``[..., D/2]``, scales f32 ``[...-1 dims]``)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 7.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7
    ).astype(jnp.int8)
    D = x.shape[-1]
    lo, hi = q[..., : D // 2], q[..., D // 2 :]
    packed = jnp.bitwise_or(jnp.left_shift(hi, 4), jnp.bitwise_and(lo, 15))
    return packed, scale


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`quantize_rows_int4`'s packing (values still need
    the scale multiply): ``[..., D/2]`` int8 → ``[..., D]`` f32."""
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)  # sign-extended low nibble
    hi = jnp.right_shift(p32, 4)  # arithmetic shift: signed high nibble
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def _cache_kind(quantized) -> str:
    """Normalize the init/prefill ``quantized`` argument: False → "model",
    True → "int8" (back-compat), or an explicit "model"/"int8"/"int4"."""
    if quantized is True:
        return "int8"
    if not quantized:
        return "model"
    if quantized not in ("model", "int8", "int4"):
        raise ValueError(f"unknown cache kind {quantized!r}")
    return quantized


def init_cache(
    cfg: GPT2Config, batch: int, capacity: int, dtype=jnp.float32,
    quantized=False,
) -> KVCache:
    kind = _cache_kind(quantized)
    D = cfg.n_embd if kind != "int4" else cfg.n_embd // 2
    shape = (cfg.n_layer, batch, capacity, D)
    if kind != "model":
        sshape = shape[:-1]
        return KVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.float32),
            jnp.zeros(sshape, jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def init_gpt2_params(key: jax.Array, cfg: GPT2Config, dtype=jnp.float32) -> Dict:
    """HF-style init: normal(0, initializer_range) weights, zero biases,
    unit LN gains; c_proj weights get the depth-scaled init."""
    D, L = cfg.n_embd, cfg.n_layer
    std = cfg.initializer_range
    ks = jax.random.split(key, 8)
    proj_std = std / math.sqrt(2 * L)
    normal = lambda k, shape, s: (s * jax.random.normal(k, shape, jnp.float32)).astype(dtype)
    return {
        "wte": normal(ks[0], (cfg.vocab_size, D), std),
        "wpe": normal(ks[1], (cfg.n_positions, D), std),
        "h": {
            "ln1_g": jnp.ones((L, D), dtype),
            "ln1_b": jnp.zeros((L, D), dtype),
            "attn_w": normal(ks[2], (L, D, 3 * D), std),
            "attn_b": jnp.zeros((L, 3 * D), dtype),
            "attn_proj_w": normal(ks[3], (L, D, D), proj_std),
            "attn_proj_b": jnp.zeros((L, D), dtype),
            "ln2_g": jnp.ones((L, D), dtype),
            "ln2_b": jnp.zeros((L, D), dtype),
            "mlp_fc_w": normal(ks[4], (L, D, 4 * D), std),
            "mlp_fc_b": jnp.zeros((L, 4 * D), dtype),
            "mlp_proj_w": normal(ks[5], (L, 4 * D, D), proj_std),
            "mlp_proj_b": jnp.zeros((L, D), dtype),
        },
        "lnf_g": jnp.ones((D,), dtype),
        "lnf_b": jnp.zeros((D,), dtype),
    }


def _ln_fwd_impl(x, g, b, eps):
    # reduces accumulate in f32 (dtype=) WITHOUT materializing an f32
    # copy of x; elementwise math stays in x.dtype so bf16 activations
    # never round-trip through HBM at 4 bytes.
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    xm = x - mean.astype(x.dtype)
    var = jnp.mean(jnp.square(xm), axis=-1, keepdims=True, dtype=jnp.float32)
    rstd = jax.lax.rsqrt(var + eps).astype(x.dtype)
    xhat = xm * rstd
    return xhat * g + b, (xhat, rstd, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, g, b, eps):
    """LayerNorm with a hand-written VJP: one fused reduce pass
    (d-gain/d-bias/both row stats) + one elementwise pass for dx, with
    f32 accumulation but no materialized f32 activation copies. (On a
    v5e at b256×236 this is only ~1 ms/step better than autodiff — XLA
    fuses the naive form well — but it pins the numerics: stats always
    accumulate f32 even for bf16 activations.)"""
    y, _ = _ln_fwd_impl(x, g, b, eps)
    return y


def _ln_fwd(x, g, b, eps):
    return _ln_fwd_impl(x, g, b, eps)


def _ln_bwd(eps, res, dy):
    xhat, rstd, g = res
    t = dy * g
    mt = jnp.mean(t, axis=-1, keepdims=True, dtype=jnp.float32)
    mtx = jnp.mean(t * xhat, axis=-1, keepdims=True, dtype=jnp.float32)
    dx = (t - mt.astype(t.dtype) - xhat * mtx.astype(t.dtype)) * rstd
    axes = tuple(range(dy.ndim - 1))
    dg = jnp.sum((dy * xhat).astype(jnp.float32), axis=axes).astype(g.dtype)
    db = jnp.sum(dy.astype(jnp.float32), axis=axes).astype(g.dtype)
    return dx, dg, db


_layer_norm.defvjp(_ln_fwd, _ln_bwd)


def _gelu_new(x):
    return (
        0.5
        * x
        * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * jnp.power(x, 3.0))))
    )


def _dropout(x, rate, key):
    """Inverted dropout from uint16 random bits.

    ``jax.random.bernoulli`` draws 32 random bits per element; the mask
    only needs a 16-bit threshold compare (keep-rate granularity 1/65536
    — for the reference's 0.1 rates the effective rate is exact to
    1.5e-5). Halving the generated bits halves the rng-bit-generator
    time, the single biggest non-matmul item left in the train step
    after the attention kernel (~19 ms/step at b256, docs/PERF.md). The
    scale uses the EXACT realized keep probability, so the estimator
    stays unbiased."""
    if key is None or rate <= 0.0:
        return x
    thr = int(round(rate * 65536.0))
    keep_p = (65536 - thr) / 65536.0
    bits = jax.random.bits(key, x.shape, jnp.uint16)
    return jnp.where(bits >= jnp.uint16(thr), x / keep_p, 0.0)


def _split_heads(x, n_head):
    B, T, D = x.shape
    return x.reshape(B, T, n_head, D // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, T, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * hd)


def gpt2_forward(
    params: Dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,
    position_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    return_kv: bool = False,
    remat: bool = False,
    tp_axis: Optional[str] = None,
    attn_impl: str = "xla",
    remat_policy: str = "full",
    lm_head: bool = True,
    pp: Optional[Tuple] = None,
    segment_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Full-sequence (teacher-forced / prefill) forward.

    Args:
      inputs_embeds: ``[B, T, D]`` (already projected to GPT-2 space).
      position_ids: ``[B, T]`` or ``[T]`` int32.
      token_type_ids: ``[B, T]`` — embedded via ``wte`` (HF semantics).
      attention_mask: ``[B, T]`` 1/0 key-padding mask.
      segment_ids: ``[B, T]`` int32 (sequence packing, ``mmtg_tpu.pack``):
        attention becomes causal WITHIN equal segment ids and blocked
        across them; replaces ``attention_mask``. Train-path only
        (pallas_packed kernel or xla; no return_kv/pp).
      remat: rematerialize each block in the backward pass
        (``jax.checkpoint`` on the layer scan body) — trades ~33% extra
        forward FLOPs for O(1-layer) instead of O(12-layer) activation
        memory; required for batch-256 training in 16GB HBM.
      tp_axis: Megatron-style tensor parallelism under ``shard_map``: the
        caller holds this device's HEAD-ALIGNED param shard (see
        ``parallel.mesh.regroup_qkv_for_tp`` + ``decode_param_pspecs``) —
        QKV/MLP-fc column-parallel, attn-proj/MLP-proj row-parallel with
        a ``psum`` over ``tp_axis`` before the (replicated) bias. The
        local head count is derived from the param shapes, so the same
        code serves both the unsharded and per-shard cases.
      attn_impl: "xla" (masked-softmax over a materialized [B,1,T,T]
        bias), "pallas" (fused train-attention kernel,
        :mod:`mmtg_tpu.ops.train_attention` — probs never hit HBM,
        attention dropout via the on-core PRNG), or "auto" (pallas on
        TPU backends when eligible). ``return_kv`` prefills and
        head_dim > 128 always take the xla path.
      pp: ``(mesh, n_micro)`` — run the layer stack GPipe-pipelined over
        the mesh's ``pipe`` axis (``parallel.pipeline``): stacked layer
        params sharded over stages, microbatched activations streamed
        via ``ppermute``. Train path only (``return_kv`` unsupported).
    Returns:
      (logits ``[B, T, V]``, optionally per-layer (k, v) each
      ``[L, B, H_local, T, hd]`` for cache prefill).
    """
    B, T, D = inputs_embeds.shape
    h = inputs_embeds + jnp.take(params["wpe"], position_ids, axis=0)
    if token_type_ids is not None:
        h = h + jnp.take(params["wte"], token_type_ids, axis=0)

    rng = dropout_rng if not deterministic else None
    if rng is not None:
        # Dropout bits come from the TPU's hardware RNG ("rbg" impl):
        # threefry masks over the train shapes cost ~200ms/step on a v5e
        # (measured; [B,T,4D] resid masks alone are ~1.1G elements/fwd).
        data = jax.random.bits(jax.random.fold_in(rng, 0x5EED), (4,),
                               jnp.uint32)
        rng = jax.random.wrap_key_data(data, impl="rbg")
        rng, k_embd = jax.random.split(rng)
        h = _dropout(h, cfg.embd_pdrop, k_embd)

    if attn_impl == "auto":
        # "pallas_packed" (standard unpadded slab) is the TPU default:
        # identical in-kernel cost to the padded "pallas" variant but the
        # qkv/proj matmuls around it run at their true (halved) size —
        # ~75 ms/step at b256 (tools/trace_train.py round-5 attribution).
        attn_impl = (
            "pallas_packed" if jax.default_backend() in ("tpu", "axon")
            else "xla"
        )
    if return_kv or cfg.head_dim > 128:
        attn_impl = "xla"
    if segment_ids is not None:
        if pp is not None or return_kv:
            raise ValueError("segment_ids is train-path only (no pp/kv)")
        if attn_impl == "pallas":
            attn_impl = "pallas_packed"  # only the packed kernel takes seg
    if attn_impl == "pallas_packed" and cfg.head_dim % 64:
        # packed kernel needs 64-lane-sliceable heads
        attn_impl = "xla" if segment_ids is not None else "pallas"

    scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.head_dim, h.dtype))
    # local head count from the (possibly TP-sharded) QKV shape
    n_head = (params["h"]["attn_w"].shape[-1] // 3) // cfg.head_dim

    bias = key_bias = seg = None
    T_real = T
    if attn_impl in ("pallas", "pallas_packed"):
        # Sequence padded once to a 128 multiple for the whole stack;
        # padded keys get -inf bias, padded query rows are sliced off.
        from mmtg_tpu.ops.train_attention import (
            mha_train,
            mha_train_packed,
            mha_train_packed_seg,
            pad_proj_weights,
            pad_qkv_weights,
        )

        Tp = ((T + 127) // 128) * 128
        if Tp != T:
            h = jnp.pad(h, ((0, 0), (0, Tp - T), (0, 0)))
        if segment_ids is not None:
            # pad slots get a dedicated segment: they see only themselves
            # (finite softmax rows) and never mix with real tokens
            seg = jnp.pad(segment_ids.astype(jnp.int32),
                          ((0, 0), (0, Tp - T)), constant_values=2**15)
        else:
            mask = (
                attention_mask
                if attention_mask is not None
                else jnp.ones((B, T), jnp.int32)
            )
            mask = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, Tp - T)))
            key_bias = (1.0 - mask) * NEG_INF  # [B, Tp] rows
        T = Tp
    else:
        # Additive bias: causal + key padding, [B, 1, T, T].
        causal = jnp.tril(jnp.ones((T, T), bool))
        if segment_ids is not None:
            s = segment_ids.astype(jnp.int32)
            eq = s[:, None, :, None] == s[:, None, None, :]
            bias = jnp.where(causal[None, None] & eq, 0.0, NEG_INF).astype(
                h.dtype
            )
        else:
            bias = jnp.where(causal, 0.0, NEG_INF)[None, None, :, :]
            if attention_mask is not None:
                pad = (1.0 - attention_mask.astype(h.dtype)) * NEG_INF
                bias = bias + pad[:, None, None, :]

    def make_block(aux, micro_idx=None):
        """Build the layer-scan body from its batch-dependent inputs.

        ``aux = (bias, key_bias, seg, rng)`` arrives as explicit arguments
        so the pipeline path (``parallel.pipeline``) can pass per-device
        shards through shard_map instead of closure captures.
        ``micro_idx`` (pipeline only) folds the microbatch index into the
        dropout rng so microbatches draw independent masks."""
        bias, key_bias, seg, rng = aux
        if rng is not None and micro_idx is not None:
            rng = jax.random.fold_in(rng, micro_idx)

        def block(carry, xs):
            h, layer_idx = carry
            lp = xs
            if rng is not None:
                layer_rng = jax.random.fold_in(rng, layer_idx)
                k_attn, k_resid1, k_resid2 = jax.random.split(layer_rng, 3)
            a = _layer_norm(h, lp["ln1_g"], lp["ln1_b"], cfg.layer_norm_epsilon)
            if attn_impl == "pallas_packed":
                # Standard c_attn slab, no head padding: the projection
                # emits [B, Tp, 3·H·hd] directly and the kernel slices
                # heads at static 64-lane offsets on-chip.
                qkv = checkpoint_name(a @ lp["attn_w"], "qkv")
                rate = cfg.attn_pdrop if rng is not None else 0.0
                seed = (
                    jax.random.randint(k_attn, (1,), 0, 2**31 - 1, jnp.int32)
                    if rng is not None
                    else jnp.zeros((1,), jnp.int32)
                )
                if seg is not None:
                    ctx = mha_train_packed_seg(
                        qkv, lp["attn_b"], seg, seed, n_head, rate,
                        1.0 / math.sqrt(cfg.head_dim),
                    )
                else:
                    ctx = mha_train_packed(
                        qkv, lp["attn_b"], key_bias, seed, n_head, rate,
                        1.0 / math.sqrt(cfg.head_dim),
                    )
                ctx = checkpoint_name(ctx, "attn_ctx")
                attn_out = ctx @ lp["attn_proj_w"]
                k = v = None
            elif attn_impl == "pallas":
                wq, bq = pad_qkv_weights(
                    lp["attn_w"], lp["attn_b"], n_head, cfg.head_dim
                )
                # [B, Tp, H*384] head-major fused slabs; the projection bias
                # is added inside the kernel so its gradient never needs a
                # standalone [B·T, H·384] reduce.
                qkv = checkpoint_name(a @ wq, "qkv")
                rate = cfg.attn_pdrop if rng is not None else 0.0
                seed = (
                    jax.random.randint(k_attn, (1,), 0, 2**31 - 1, jnp.int32)
                    if rng is not None
                    else jnp.zeros((1,), jnp.int32)
                )
                ctx = mha_train(
                    qkv, bq, key_bias, seed, n_head, rate,
                    1.0 / math.sqrt(cfg.head_dim),
                )
                ctx = checkpoint_name(ctx, "attn_ctx")
                attn_out = ctx @ pad_proj_weights(
                    lp["attn_proj_w"], n_head, cfg.head_dim
                )
                k = v = None
            else:
                qkv = checkpoint_name(a @ lp["attn_w"] + lp["attn_b"], "qkv")
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q, k, v = (_split_heads(t, n_head) for t in (q, k, v))
                scores = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
                ).astype(h.dtype) * scale
                probs = jax.nn.softmax(scores + bias, axis=-1)
                if rng is not None:
                    probs = _dropout(probs, cfg.attn_pdrop, k_attn)
                ctx = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, v))
                ctx = checkpoint_name(ctx, "attn_ctx")
                attn_out = ctx @ lp["attn_proj_w"]  # row-parallel under TP
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            attn_out = attn_out + lp["attn_proj_b"]
            if rng is not None:
                attn_out = _dropout(attn_out, cfg.resid_pdrop, k_resid1)
            h = h + attn_out
            m = _layer_norm(h, lp["ln2_g"], lp["ln2_b"], cfg.layer_norm_epsilon)
            m = checkpoint_name(m @ lp["mlp_fc_w"] + lp["mlp_fc_b"], "mlp_fc1")
            m = _gelu_new(m)
            m = m @ lp["mlp_proj_w"]  # row-parallel under TP
            if tp_axis is not None:
                m = jax.lax.psum(m, tp_axis)
            m = m + lp["mlp_proj_b"]
            if rng is not None:
                m = _dropout(m, cfg.resid_pdrop, k_resid2)
            h = h + m
            return (h, layer_idx + 1), (k, v) if return_kv else None

        return block

    aux = (bias, key_bias, seg, rng)
    if pp is not None:
        if return_kv:
            raise ValueError("pipeline parallelism is train-path only "
                             "(return_kv unsupported)")
        from mmtg_tpu.parallel.pipeline import pipeline_stack

        pp_mesh, n_micro = pp
        h = pipeline_stack(
            lambda a, m: _remat_block(make_block(a, m), remat, remat_policy),
            params["h"], h, aux, pp_mesh, n_micro,
        )
        kv = None
    else:
        block_fn = _remat_block(make_block(aux), remat, remat_policy)
        (h, _), kv = jax.lax.scan(block_fn, (h, 0), params["h"])
    if T != T_real:
        h = h[:, :T_real]
    h = _layer_norm(h, params["lnf_g"], params["lnf_b"], cfg.layer_norm_epsilon)
    if not lm_head:
        # hidden states for a chunked LM head (loss.py) — at train shapes
        # the full [B, T, V] logits are 1.6 GB bf16 + a 2.9 GB f32
        # log-softmax; the chunked loss never materializes them.
        return h, kv
    logits = h @ params["wte"].T
    return logits, kv


def gpt2_decode_step(
    params: Dict,
    cfg: GPT2Config,
    cache: KVCache,
    x_embed: jnp.ndarray,
    position: jnp.ndarray,
    token_type_id: jnp.ndarray,
    key_mask: jnp.ndarray,
    window: Optional[int] = None,
    attn_impl: str = "xla",
    tp_axis: Optional[str] = None,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, KVCache]:
    """One-token KV-cached decode step.

    Args:
      cache: fixed-capacity :class:`KVCache`; the new token's k/v are
        written at index ``position`` before attending.
      x_embed: ``[B, D]`` embedding of the current token.
      position: scalar int32 — absolute position (= cache write index).
      token_type_id: ``[B]`` int32 type id for this token.
      key_mask: ``[B, T_max]`` 1/0 — which cache slots are attendable
        (positions ≤ current AND not padding, per the reference's rebuilt
        inference mask ``model.py:309-312``).
      window: static attention window — only cache slots ``[0, window)``
        are read. Must satisfy ``window > position``. The segmented decode
        loop grows this as generation advances so early steps don't stream
        the whole (empty) cache from HBM.
      attn_impl: "xla" (masked softmax over the full window) or "pallas"
        (dynamic-length tile reads via
        :func:`mmtg_tpu.ops.decode_attention.decode_attention`).
      tp_axis: tensor parallelism under ``shard_map`` (see
        :func:`gpt2_forward`); the cache then holds only this shard's
        heads (``D_kv = D / tp_size``) and attn/MLP projections psum.
      unroll: unroll factor for the layer loop (``lax.fori_loop``
        ``unroll=``). At tiny decode batches every per-layer op is
        microseconds, so the step is op-count/loop-bookkeeping bound —
        unrolling turns the nested while's dynamic layer indexing into
        static slices and lets XLA schedule across layer boundaries.
        Math-identical; resolved by ``decoding.resolve_layer_unroll``.
    Returns:
      (logits ``[B, V]``, updated cache).
    """
    B, D = x_embed.shape
    hd = cfg.head_dim
    # local (possibly TP-sharded) head count + cache feature width
    D_kv = params["h"]["attn_w"].shape[-1] // 3
    n_head = D_kv // hd
    W = cache.capacity if window is None else window
    h = (
        x_embed
        + params["wpe"][position]
        + jnp.take(params["wte"], token_type_id, axis=0)
    )
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, h.dtype))
    bias = (1.0 - key_mask[:, :W].astype(h.dtype)) * NEG_INF  # [B, W]

    # fori_loop (not scan) over layers: scan would emit the updated cache as
    # freshly-allocated stacked ys — a full multi-GB cache copy per decode
    # step. With a fori_loop carry + dynamic_update_slice, XLA keeps the
    # cache in place; per-step HBM traffic is one cache READ, not
    # read+rewrite.
    quantized = cache.quantized
    # merged-KV mode: decoding.generate packs k||v into cache.k
    # ([L, B, T, 2D]) and leaves a zero-size sentinel in cache.v — one
    # tile DMA per sub-tile in the Pallas kernel (see
    # decode_attention_int8_append_merged)
    merged = cache.v.ndim == 1
    # int4 mode is identified statically by the packed trailing dim
    int4 = quantized and not merged and cache.k.shape[-1] * 2 == D_kv
    D_store = D_kv // 2 if int4 else D_kv
    # weight-only int8 (quantize_decode_weights): the _q/_s keys are a
    # STATIC structure property, so the branch disappears at trace time.
    # Converts fuse into the matmul reads — the dot streams int8 weights
    # from HBM (half the glue matmuls' weight traffic, which is the
    # per-layer glue's memory floor at decode batch sizes).
    int8_w = "attn_w_q" in params["h"]

    if attn_impl == "fused":
        # whole-step megakernel: ALL layers in one pallas_call (per-call
        # fixed cost paid once; glue matmuls overlap cache streaming).
        # Scope-gated by decoding._generate_jit; fail loudly if misused.
        from mmtg_tpu.ops import decode_megakernel

        if not (quantized and not merged and not int4 and tp_axis is None
                and not int8_w):
            raise ValueError(
                "attn_impl='fused' needs an int8 split cache, full-precision "
                "weights and no tensor parallelism"
            )
        h, new_k, new_v, new_ks, new_vs = decode_megakernel.decode_block_fused(
            h, params["h"], cache.k, cache.v, cache.k_scale, cache.v_scale,
            key_mask, position, n_head=n_head,
            eps=cfg.layer_norm_epsilon,
            block_b=decode_megakernel.BLOCK_B,
            sub_tiles=decode_megakernel.SUB_TILES,
            interpret=decode_megakernel.INTERPRET,
        )
        h = _layer_norm(
            h, params["lnf_g"], params["lnf_b"], cfg.layer_norm_epsilon
        )
        return h @ params["wte"].T, KVCache(new_k, new_v, new_ks, new_vs)

    def mm(x, lp, key):
        if int8_w:
            # f32 scale epilogue, cast back to the stream dtype (the cast
            # fuses into the multiply; h must STAY bf16 or every
            # downstream op doubles its bandwidth)
            return ((x @ lp[key + "_q"].astype(x.dtype)) * lp[key + "_s"]).astype(x.dtype)
        return x @ lp[key]

    def layer(l, carry):
        h, k_full, v_full, ks_full, vs_full = carry
        lp = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, l, 0, keepdims=False),
            params["h"],
        )
        a = _layer_norm(h, lp["ln1_g"], lp["ln1_b"], cfg.layer_norm_epsilon)
        qkv = mm(a, lp, "attn_w") + lp["attn_b"]  # [B, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if attn_impl == "pallas":
            # fused append+attend: quantization (when any) and the cache
            # write happen inside the kernel on the aliased in-place cache
            # (XLA's DUS on the big cache buffer costs ~25x the bytes
            # written — 1.17 ms/step at b512, docs/PERF.md).
            from mmtg_tpu.ops.decode_attention import (
                decode_attention_fp_append,
                decode_attention_int4_append,
                decode_attention_int8_append,
                decode_attention_int8_append_merged,
            )

            if merged:
                ctx, k_full, ks_full, vs_full = decode_attention_int8_append_merged(
                    q, k, v, k_full, ks_full, vs_full, key_mask,
                    position, l, n_head=n_head,
                )
            elif int4:
                ctx, k_full, v_full, ks_full, vs_full = decode_attention_int4_append(
                    q, k, v, k_full, v_full, ks_full, vs_full, key_mask,
                    position, l, n_head=n_head,
                )
            elif quantized:
                ctx, k_full, v_full, ks_full, vs_full = decode_attention_int8_append(
                    q, k, v, k_full, v_full, ks_full, vs_full, key_mask,
                    position, l, n_head=n_head,
                )
            else:
                ctx, k_full, v_full = decode_attention_fp_append(
                    q, k, v, k_full, v_full, key_mask, position, l,
                    n_head=n_head,
                )
            attn_out = mm(ctx, lp, "attn_proj_w")
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            h = h + attn_out + lp["attn_proj_b"]
            m = _layer_norm(h, lp["ln2_g"], lp["ln2_b"], cfg.layer_norm_epsilon)
            m = _gelu_new(mm(m, lp, "mlp_fc_w") + lp["mlp_fc_b"])
            m = mm(m, lp, "mlp_proj_w")
            if tp_axis is not None:
                m = jax.lax.psum(m, tp_axis)
            h = h + m + lp["mlp_proj_b"]
            return h, k_full, v_full, ks_full, vs_full
        if quantized:
            quant = quantize_rows_int4 if int4 else quantize_rows
            k_store, ks = quant(k)
            v_store, vs = quant(v)
            ks_full = jax.lax.dynamic_update_slice(
                ks_full, ks.reshape(1, B, 1), (l, 0, position)
            )
            vs_full = jax.lax.dynamic_update_slice(
                vs_full, vs.reshape(1, B, 1), (l, 0, position)
            )
        else:
            k_store, v_store = k, v
        k_full = jax.lax.dynamic_update_slice(
            k_full, k_store.reshape(1, B, 1, D_store), (l, 0, position, 0)
        )
        v_full = jax.lax.dynamic_update_slice(
            v_full, v_store.reshape(1, B, 1, D_store), (l, 0, position, 0)
        )
        qh = q.reshape(B, n_head, hd)
        k_cache = jax.lax.dynamic_index_in_dim(k_full, l, 0, keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_full, l, 0, keepdims=False)
        k_cache = jax.lax.slice_in_dim(k_cache, 0, W, axis=1)
        v_cache = jax.lax.slice_in_dim(v_cache, 0, W, axis=1)
        if quantized:
            ks_c = jax.lax.dynamic_index_in_dim(ks_full, l, 0, keepdims=False)
            vs_c = jax.lax.dynamic_index_in_dim(vs_full, l, 0, keepdims=False)
            ks_c = jax.lax.slice_in_dim(ks_c, 0, W, axis=1)
            vs_c = jax.lax.slice_in_dim(vs_c, 0, W, axis=1)
            if int4:
                k_cache = unpack_int4(k_cache)
                v_cache = unpack_int4(v_cache)
            k_cache = k_cache.astype(jnp.float32) * ks_c[..., None]
            v_cache = (v_cache.astype(jnp.float32) * vs_c[..., None]).astype(
                h.dtype
            )
            k_cache = k_cache.astype(h.dtype)
        k_cache = k_cache.reshape(B, W, n_head, hd)
        v_cache = v_cache.reshape(B, W, n_head, hd)
        scores = jnp.einsum(
            "bhd,bthd->bht", qh, k_cache, preferred_element_type=jnp.float32
        ).astype(h.dtype) * scale
        probs = jax.nn.softmax(scores + bias[:, None, :], axis=-1)
        ctx = jnp.einsum("bht,bthd->bhd", probs, v_cache).reshape(B, D_kv)
        attn_out = mm(ctx, lp, "attn_proj_w")  # row-parallel under TP
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        h = h + attn_out + lp["attn_proj_b"]
        m = _layer_norm(h, lp["ln2_g"], lp["ln2_b"], cfg.layer_norm_epsilon)
        m = _gelu_new(mm(m, lp, "mlp_fc_w") + lp["mlp_fc_b"])
        m = mm(m, lp, "mlp_proj_w")  # row-parallel under TP
        if tp_axis is not None:
            m = jax.lax.psum(m, tp_axis)
        h = h + m + lp["mlp_proj_b"]
        return h, k_full, v_full, ks_full, vs_full

    # None carries break fori_loop pytree matching → dummy zero-d arrays
    ks0 = cache.k_scale if quantized else jnp.zeros((), jnp.float32)
    vs0 = cache.v_scale if quantized else jnp.zeros((), jnp.float32)
    h, new_k, new_v, new_ks, new_vs = jax.lax.fori_loop(
        0, cfg.n_layer, layer, (h, cache.k, cache.v, ks0, vs0),
        unroll=unroll,
    )
    h = _layer_norm(h, params["lnf_g"], params["lnf_b"], cfg.layer_norm_epsilon)
    if int8_w:
        # f32 scale epilogue, back to the stream dtype (the decode scan's
        # logits carry must keep a stable dtype)
        logits = (
            (h @ params["wte_q"].T.astype(h.dtype)) * params["wte_s"].T
        ).astype(h.dtype)
    else:
        logits = h @ params["wte"].T  # weight-tied head
    if quantized:
        return logits, KVCache(new_k, new_v, new_ks, new_vs)
    return logits, KVCache(new_k, new_v)


def prefill_cache(
    params: Dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,
    position_ids: jnp.ndarray,
    token_type_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    capacity: int,
    quantized=False,
    tp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the prompt once, returning its logits and a cache padded to
    ``capacity`` (the encoder+prefix runs once; per-token cost becomes
    O(T) instead of the reference's O(T²) re-forward, ``generate.py:124``).
    ``quantized``: False/"model", True/"int8", or "int4" (packed).
    Under ``tp_axis`` the cache holds only this shard's heads."""
    logits, kv = gpt2_forward(
        params,
        cfg,
        inputs_embeds,
        position_ids,
        token_type_ids,
        attention_mask,
        deterministic=True,
        return_kv=True,
        tp_axis=tp_axis,
    )
    k, v = kv  # each [L, B, H, T, hd] from the full forward
    L_, B_, H_, T, hd_ = k.shape
    # → [L, B, T, D] cache layout (merge heads into lanes)
    k = k.transpose(0, 1, 3, 2, 4).reshape(L_, B_, T, H_ * hd_)
    v = v.transpose(0, 1, 3, 2, 4).reshape(L_, B_, T, H_ * hd_)
    pad = [(0, 0), (0, 0), (0, capacity - T), (0, 0)]
    kind = _cache_kind(quantized)
    if kind != "model":
        quant = quantize_rows_int4 if kind == "int4" else quantize_rows
        kq, ks = quant(k)
        vq, vs = quant(v)
        spad = pad[:-1]
        return logits, KVCache(
            jnp.pad(kq, pad), jnp.pad(vq, pad),
            jnp.pad(ks, spad), jnp.pad(vs, spad),
        )
    return logits, KVCache(jnp.pad(k, pad), jnp.pad(v, pad))


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------


def import_hf_gpt2(state_dict, cfg: GPT2Config, prefix: str = "") -> Dict:
    """Convert an HF ``GPT2LMHeadModel`` state dict (tensors or ndarrays)
    to our stacked pytree. HF ``Conv1D`` weights are already ``[in, out]``
    so no transposes are needed."""
    import numpy as np

    def get(name):
        t = state_dict[prefix + name]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    L = cfg.n_layer
    stack = lambda name: jnp.asarray(
        np.stack([get(f"transformer.h.{i}.{name}") for i in range(L)])
    )
    return {
        "wte": jnp.asarray(get("transformer.wte.weight")),
        "wpe": jnp.asarray(get("transformer.wpe.weight")),
        "h": {
            "ln1_g": stack("ln_1.weight"),
            "ln1_b": stack("ln_1.bias"),
            "attn_w": stack("attn.c_attn.weight"),
            "attn_b": stack("attn.c_attn.bias"),
            "attn_proj_w": stack("attn.c_proj.weight"),
            "attn_proj_b": stack("attn.c_proj.bias"),
            "ln2_g": stack("ln_2.weight"),
            "ln2_b": stack("ln_2.bias"),
            "mlp_fc_w": stack("mlp.c_fc.weight"),
            "mlp_fc_b": stack("mlp.c_fc.bias"),
            "mlp_proj_w": stack("mlp.c_proj.weight"),
            "mlp_proj_b": stack("mlp.c_proj.bias"),
        },
        "lnf_g": jnp.asarray(get("transformer.ln_f.weight")),
        "lnf_b": jnp.asarray(get("transformer.ln_f.bias")),
    }


def quantize_decode_weights(params: Dict, scale_axis: Optional[str] = None) -> Dict:
    """Weight-only int8 for the decode hot path (default at decode
    batches ≤ 32 via ``GenerateConfig.weight_dtype="auto"``).

    Per-OUTPUT-channel symmetric abs-max quantization of the four glue
    matmuls (stacked ``[L, in, out]`` → scales ``[L, 1, out]``) and the
    LM head (per-vocab-row over ``wte`` → scales ``[V, 1]``). The decode
    step's matmuls then stream int8 weights from HBM (the converts fuse
    into the dot reads) — halving the per-layer glue's weight traffic,
    its memory floor at decode batch sizes. The original full-precision
    weights stay in the tree: prefill, the type-id ``wte`` gather and the
    ``wpe`` add keep full precision (one-time / tiny-row reads).

    ``scale_axis``: when quantizing INSIDE a tensor-parallel shard_map
    (``generate_sharded``), the row-parallel projections (in-sharded
    ``attn_proj_w`` / ``mlp_proj_w``) see only their input-row slice, so
    their local abs-max would differ from the global one — different
    numerics per mesh shape. A ``pmax`` over the model axis restores the
    exact global scales (column-parallel weights shard whole output
    channels, so their per-channel scales are already global).
    """
    out = dict(params)
    h = dict(params["h"])
    for key in ("attn_w", "attn_proj_w", "mlp_fc_w", "mlp_proj_w"):
        w = h[key].astype(jnp.float32)  # [L, in, out]
        absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
        if scale_axis is not None and key in ("attn_proj_w", "mlp_proj_w"):
            absmax = jax.lax.pmax(absmax, scale_axis)
        s = jnp.maximum(absmax, 1e-8) / 127.0
        h[key + "_q"] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        h[key + "_s"] = s
    out["h"] = h
    w = params["wte"].astype(jnp.float32)  # [V, D]
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=1, keepdims=True), 1e-8) / 127.0
    out["wte_q"] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out["wte_s"] = s
    return out
