"""On-hardware validation + same-session A/B bench of the decode megakernel.

1. Correctness: full-size GPT-2 (12L/12H/768d) single decode steps at a
   POSITION SWEEP spanning all tile-count regimes, comparing the
   whole-step megakernel (``attn_impl='fused'``) against the per-layer
   Pallas path (``attn_impl='pallas'``) on the real chip: logits within
   the documented bf16-internal f32-matmul noise, appended cache
   rows/scales in near-exact agreement, neighbors untouched.

2. Perf: same-session A/B of the full generate engine at the headline
   shape (b512, 220 tokens, int8 cache, canonical sampling).

Usage:  python tools/validate_megakernel_on_tpu.py [--skip-bench] [--batch 512]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-validate", action="store_true")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="float32 collapses the bf16 rounding noise — the "
                         "exactness check; bfloat16 validates the serving "
                         "dtype against the known-good noise band")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmtg_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from mmtg_tpu.configs import GPT2Config
    from mmtg_tpu.models.gpt2 import (
        KVCache, gpt2_decode_step, init_gpt2_params, quantize_rows,
    )

    cfg = GPT2Config()
    L, D, T, B = cfg.n_layer, cfg.n_embd, 256, 64
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    f32 = dtype == jnp.float32
    params = init_gpt2_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    rng = np.random.default_rng(0)

    if not args.skip_validate:
        k = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((L, B, T, D)), jnp.float32)
        kq, ks = quantize_rows(k)
        vq, vs = quantize_rows(v)

        step = jax.jit(gpt2_decode_step, static_argnames=("cfg", "attn_impl"))
        ok = True
        for pos in [0, 7, 8, 31, 32, 63, 64, 127, 128, 200, 255]:
            x = jnp.asarray(rng.standard_normal((B, D)) * 0.1, dtype)
            tt = jnp.asarray(rng.integers(0, 5, (B,)), jnp.int32)
            mask = jnp.tile(
                (jnp.arange(T)[None, :] <= pos).astype(jnp.int32), (B, 1)
            )
            outs = {}
            for impl in ("pallas", "fused", "xla"):
                cache = KVCache(
                    jnp.array(kq), jnp.array(vq), jnp.array(ks), jnp.array(vs)
                )
                logits, ncache = step(
                    params, cfg, cache, x, jnp.asarray(pos), tt, mask,
                    attn_impl=impl,
                )
                outs[impl] = (
                    np.asarray(logits, np.float32),
                    np.asarray(ncache.k[:, :, pos], np.int32),
                    np.asarray(ncache.k_scale[:, :, pos], np.float32),
                    np.asarray(
                        ncache.k[:, :, (pos + 1) % T], np.int32
                    ),
                )

            def diff(a, b):
                dl = np.max(np.abs(a[0] - b[0]))
                dk = np.max(np.abs(a[1] - b[1]))
                dks = np.max(np.abs(a[2] - b[2]) / np.maximum(a[2], 1e-9))
                return dl, dk, dks

            dl, dk, dks = diff(outs["pallas"], outs["fused"])
            # calibration: the same metrics between the two KNOWN-GOOD
            # paths under identical bf16 hardware conditions
            rl, rk, rks = diff(outs["pallas"], outs["xla"])
            neigh = np.array_equal(outs["pallas"][3], outs["fused"][3])
            if f32:
                # f32 on this chip still carries ~1e-2 cross-implementation
                # noise (f32 dots run bf16-internal with pass splitting —
                # docs/PERF.md hardware-numerics note; measured here:
                # xla-vs-pallas dlogits ≈ 0.013, fused-vs-pallas ≈ 0.010,
                # i.e. fused agrees with pallas BETTER than xla does).
                # Floors cover degenerate-zero baselines (pos 0).
                line_ok = (
                    dl <= max(1.5 * rl, 0.03)
                    and dk <= max(1.5 * rk, 2)
                    and dks <= max(1.5 * rks, 6e-3)
                    and neigh
                )
            else:
                # bf16: within the pallas-vs-xla noise band (2x slack), with
                # floors for degenerate-zero baselines (e.g. pos 0, where
                # xla and pallas attend over a single slot identically and
                # the only difference left is the in-kernel qkv dot's
                # bf16 epilogue rounding vs XLA's excess-precision fusion)
                line_ok = (
                    dl <= max(2 * rl, 0.06)
                    and dk <= max(2 * rk, 4)
                    and dks <= max(2 * rks, 2e-2)
                    and neigh
                )
            ok &= line_ok
            print(
                f"pos {pos:3d}: fused-vs-pallas dlogits={dl:.4f} dk={dk:.0f} "
                f"dks={dks:.2e} | xla-vs-pallas dlogits={rl:.4f} dk={rk:.0f} "
                f"dks={rks:.2e} | neighbors={neigh} "
                f"{'OK' if line_ok else 'FAIL'}"
            )
        print("VALIDATION", "OK" if ok else "FAIL")
        if not ok:
            # nonzero exit so tools/validate_on_tpu.py (which judges by
            # returncode) reports the failure
            raise SystemExit(1)

    if args.skip_bench:
        return

    # ---- same-session A/B at the headline shape ---------------------------
    from mmtg_tpu.configs import DataConfig, GenerateConfig, ModelConfig
    from mmtg_tpu.decoding import generate
    from mmtg_tpu.models.mmtg import init_mmtg_params

    mcfg, dcfg = ModelConfig(), DataConfig()
    mparams = init_mmtg_params(jax.random.PRNGKey(0), mcfg, dtype=dtype)
    const = {
        "wenlan_table": jnp.asarray(
            rng.standard_normal((mcfg.gpt2.vocab_size, dcfg.wenlan_emb_size)),
            dtype,
        )
    }
    Bb, P, E = args.batch, dcfg.topic_prompt_length, dcfg.wenlan_emb_size
    batch = {
        "topic_ids": jnp.asarray(rng.integers(103, 8000, (Bb, P)), jnp.int32),
        "tpw_attention_mask": jnp.ones((Bb, P), jnp.int32),
        "tpw_type_ids": jnp.ones((Bb, P), jnp.int32),
        "topic_emb": jnp.asarray(rng.standard_normal((Bb, E)), dtype),
        "img_embs": jnp.asarray(rng.standard_normal((Bb, 5, E)), dtype),
        "r_embs": jnp.asarray(rng.standard_normal((Bb, 5, E)), dtype),
    }
    key = jax.random.PRNGKey(1)
    for impl in ("pallas", "fused", "pallas"):
        gcfg = GenerateConfig(cache_dtype="int8", attn_impl=impl)
        float(jnp.sum(generate(mparams, const, mcfg, dcfg, gcfg, batch, key)))
        times = []
        for i in range(args.runs):
            t0 = time.perf_counter()
            toks = generate(
                mparams, const, mcfg, dcfg, gcfg, batch,
                jax.random.fold_in(key, i),
            )
            float(jnp.sum(toks))
            times.append(time.perf_counter() - t0)
        times.sort()
        p50 = times[len(times) // 2]
        print(
            f"{impl:7s}: p50 {p50:.3f}s = {Bb * gcfg.length / p50 / 1e3:.1f}k tok/s "
            f"(best {Bb * gcfg.length / times[0] / 1e3:.1f}k, times {[round(t,3) for t in times]})"
        )


if __name__ == "__main__":
    main()
