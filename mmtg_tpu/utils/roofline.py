"""Machine-checkable roofline/FLOP models for the bench artifacts.

The bench JSON lines (``bench.py``, ``bench_train.py``) carry not just
tok/s and samples/s but *utilization against chip physics*: ``hbm_util``
(decode: modeled bytes moved ÷ wall ÷ HBM peak) and ``mfu`` (train: model
FLOPs ÷ wall ÷ MXU peak). The models live here so the arithmetic is one
readable place, shared by the benches and by BASELINE.md's target
reconciliation (the "≤10 ms @ b256" analysis).

Peak numbers: the bench chip is a single TPU v5e ("TPU v5 lite" device
kind) — 197 TFLOP/s bf16 (394 int8) and ~815 GB/s HBM. 815 is this
repo's *measured* streaming number (docs/PERF.md length-sweep: marginal
KV-cache streaming fitted at 11.58 µs/step² vs 11.8 theoretical at
815 GB/s), within 1% of the 819 spec; utilizations here use the measured
value so "1.0" means "as fast as this chip has ever been observed".
"""

from __future__ import annotations

from typing import Dict

HBM_PEAK_GBPS: Dict[str, float] = {
    "TPU v5 lite": 815.0,   # measured, docs/PERF.md; spec 819
    "TPU v5": 819.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,  # v6e spec
}

BF16_PEAK_TFLOPS: Dict[str, float] = {
    "TPU v5 lite": 197.0,
    "TPU v5": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}


def peak_hbm_gbps(device_kind: str) -> float:
    for k, v in HBM_PEAK_GBPS.items():
        if device_kind.startswith(k):
            return v
    return HBM_PEAK_GBPS["TPU v5 lite"]


def peak_bf16_tflops(device_kind: str) -> float:
    for k, v in BF16_PEAK_TFLOPS.items():
        if device_kind.startswith(k):
            return v
    return BF16_PEAK_TFLOPS["TPU v5 lite"]


def gpt2_param_count(gcfg) -> int:
    """Parameter count of the decoder (matmul weights + embeddings)."""
    d, L, V, P = gcfg.n_embd, gcfg.n_layer, gcfg.vocab_size, gcfg.n_positions
    per_layer = (
        d * 3 * d + 3 * d          # qkv
        + d * d + d                # attn proj
        + d * 4 * d + 4 * d        # mlp fc
        + 4 * d * d + d            # mlp proj
        + 4 * d                    # 2 LayerNorms
    )
    return V * d + P * d + L * per_layer + 2 * d  # + final LN


def _dtype_bytes(name: str, model_bytes: int = 2) -> float:
    return {"model": model_bytes, "int8": 1, "int4": 0.5,
            "bfloat16": 2, "float32": 4}[name]


def decode_bytes_model(
    mcfg, dcfg, B: int, length: int,
    cache_dtype: str = "int8", weight_dtype: str = "model",
    model_dtype: str = "bfloat16",
) -> Dict[str, float]:
    """Modeled HBM bytes moved by one batched KV-cached ``generate`` call.

    Counts the decode loop's three first-order terms (docs/PERF.md
    length-sweep decomposition); activations, sampling tail and the
    one-time prefill/encoder are below the few-percent level at the
    headline shape and are deliberately excluded, so ``hbm_util`` is a
    slight *under*-estimate (conservative).
    """
    g = mcfg.gpt2
    d, L, V = g.n_embd, g.n_layer, g.vocab_size
    mb = _dtype_bytes(model_dtype)
    cb = _dtype_bytes(cache_dtype, mb)
    wb = _dtype_bytes(weight_dtype, mb)

    # (1) KV-cache streaming: step t reads L × B × t × d × 2 (k and v).
    #     Σ_{t=1..length} t ≈ length²/2.
    cache_stream = L * B * d * 2 * cb * (length * (length + 1) / 2)
    # (2) decode-weight reads: every step reads all matmul weights once
    #     (qkv, proj, fc, fc-proj per layer) + the LM-head matrix.
    #     gpt2.quantize_decode_weights quantizes the LM head (wte_q) with
    #     the glue matmuls, so the head also reads at weight_dtype bytes.
    per_layer_w = (d * 3 * d + d * d + d * 4 * d + 4 * d * d)
    weight_read = (L * per_layer_w * wb + V * d * wb) * length
    # (3) cache append writes: L × B × d × 2 per step.
    cache_write = L * B * d * 2 * cb * length

    total = cache_stream + weight_read + cache_write
    return {
        "cache_stream_bytes": cache_stream,
        "weight_read_bytes": weight_read,
        "cache_write_bytes": cache_write,
        "total_bytes": total,
    }


def decode_hbm_util(
    mcfg, dcfg, B: int, length: int, wall_s: float, device_kind: str,
    cache_dtype: str = "int8", weight_dtype: str = "model",
    model_dtype: str = "bfloat16",
) -> Dict[str, float]:
    """→ {hbm_util, achieved_gbps, hbm_peak_gbps, *bytes}."""
    m = decode_bytes_model(mcfg, dcfg, B, length, cache_dtype,
                           weight_dtype, model_dtype)
    peak = peak_hbm_gbps(device_kind)
    achieved = m["total_bytes"] / wall_s / 1e9
    return {
        "hbm_util": round(achieved / peak, 3),
        "achieved_gbps": round(achieved, 1),
        "hbm_peak_gbps": peak,
        "modeled_bytes_gb": round(m["total_bytes"] / 1e9, 1),
        "cache_stream_gb": round(m["cache_stream_bytes"] / 1e9, 1),
        "weight_read_gb": round(m["weight_read_bytes"] / 1e9, 1),
    }


def train_flops_model(mcfg, dcfg, B: int) -> Dict[str, float]:
    """Modeled FLOPs for one full MMTG train step (fwd+bwd, batch B).

    Per-token forward matmul FLOPs (2·m·n·k convention), 236-token
    sequences (15 prompt + 221 targets, SURVEY.md App. A):
      per layer: qkv 6d² + attention 4·T·d + proj 2d² + MLP 16d²
      LM head: 2·d·V;  projector: 2·(E·512 + 512·d)
    Backward = 2× forward; full-block remat re-runs the forward once more
    (``TrainConfig.remat``), so hardware FLOPs = 4× forward while *model*
    FLOPs (the MFU numerator, standard convention) = 3× forward.
    """
    g = mcfg.gpt2
    d, L, V = g.n_embd, g.n_layer, g.vocab_size
    T = dcfg.topic_prompt_length + dcfg.target_length  # 236
    E = dcfg.wenlan_emb_size

    per_tok_layer = 24 * d * d + 4 * T * d
    per_tok = L * per_tok_layer + 2 * d * V + 2 * (E * 512 + 512 * d)
    fwd = B * T * per_tok
    return {
        "fwd_flops": fwd,
        "model_flops": 3 * fwd,      # fwd + bwd (the MFU numerator)
        "hw_flops": 4 * fwd,         # + the remat re-forward
        "tokens": B * T,
    }


def train_mfu(
    mcfg, dcfg, B: int, step_s: float, device_kind: str, remat: bool = True
) -> Dict[str, float]:
    """→ {mfu, hw_flops_util, achieved_tflops, peak_tflops, ...}."""
    m = train_flops_model(mcfg, dcfg, B)
    peak = peak_bf16_tflops(device_kind) * 1e12
    model_rate = m["model_flops"] / step_s
    hw_rate = (m["hw_flops"] if remat else m["model_flops"]) / step_s
    return {
        "mfu": round(model_rate / peak, 3),
        "hw_flops_util": round(hw_rate / peak, 3),
        "achieved_model_tflops": round(model_rate / 1e12, 1),
        "peak_bf16_tflops": peak / 1e12,
        "model_flops_per_step": m["model_flops"],
        "tokens_per_step": m["tokens"],
    }
