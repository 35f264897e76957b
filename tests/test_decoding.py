"""Generation engine tests: sampling ops, frame structure, and exact
equivalence between the KV-cached scan decode and a reference-style
full-re-forward decode (generate.py:97-145 semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import GenerateConfig, SpecialTokens
from mmtg_tpu.decoding import generate, postprocess_tokens
from mmtg_tpu.models.mmtg import (
    init_mmtg_params,
    mmtg_forward_infer,
    train_scheme_type_ids,
)
from mmtg_tpu.ops.sampling import (
    apply_repetition_penalty,
    frame_forced_token,
    sample_next_token,
    top_k_top_p_filter,
)

SPECIAL = SpecialTokens()


# ---------------------------------------------------------------------------
# sampling ops vs the reference filter (torch oracle)
# ---------------------------------------------------------------------------


def _reference_filter_np(logits, top_k, top_p):
    """Literal numpy transcription of generate.py:64-94 (batch 1)."""
    logits = logits.copy()
    if top_k > 0:
        kth = np.sort(logits)[-top_k]
        logits[logits < kth] = -np.inf
    if top_p > 0.0:
        order = np.argsort(-logits, kind="stable")
        sorted_logits = logits[order]
        ex = np.exp(sorted_logits - np.nanmax(sorted_logits[np.isfinite(sorted_logits)]))
        ex[~np.isfinite(sorted_logits)] = 0.0
        probs = ex / ex.sum()
        cum = np.cumsum(probs)
        remove = cum > top_p
        remove[1:] = remove[:-1].copy()
        remove[0] = False
        logits[order[remove]] = -np.inf
    return logits


@pytest.mark.parametrize("top_k,top_p", [(5, 0.0), (0, 0.7), (10, 0.7), (3, 0.99)])
def test_filter_matches_reference(top_k, top_p, rng):
    logits = rng.standard_normal(50).astype(np.float32) * 3
    ref = _reference_filter_np(logits, top_k, top_p)
    ours = np.asarray(top_k_top_p_filter(jnp.asarray(logits)[None], top_k, top_p))[0]
    kept_ref = np.isfinite(ref)
    kept_ours = ours > -1e29
    np.testing.assert_array_equal(kept_ours, kept_ref)
    np.testing.assert_allclose(ours[kept_ours], ref[kept_ref], rtol=1e-6)


def test_repetition_penalty_faithful_division():
    # the reference divides unconditionally — negative logits get BOOSTED
    # (generate.py:131); we reproduce that faithfully.
    logits = jnp.asarray([[2.0, -2.0, 1.0, 3.0]])
    seen = jnp.asarray([[True, True, False, False]])
    out = apply_repetition_penalty(logits, seen, 2.0, exempt_ids=(3,))
    np.testing.assert_allclose(np.asarray(out)[0], [1.0, -1.0, 1.0, 3.0])


def test_repetition_penalty_per_occurrence():
    # generate.py:127-131 builds set(generated[0]) of 0-dim TENSORS — the
    # set never dedupes, so a token repeated n times is divided n times.
    logits = jnp.asarray([[8.0, -8.0, 1.0, 3.0]])
    counts = jnp.asarray([[3, 2, 0, 5]])
    out = apply_repetition_penalty(logits, counts, 2.0, exempt_ids=(3,))
    np.testing.assert_allclose(
        np.asarray(out)[0], [1.0, -2.0, 1.0, 3.0], rtol=1e-6
    )


def test_frame_positions():
    # (i+2) % 22 == 0 → EOS; == 1 → START; i=0 is never forced
    forced = []
    for i in range(46):
        f, tok = frame_forced_token(jnp.asarray(i))
        forced.append((bool(f), int(tok)))
    assert forced[0] == (False, 0)
    assert forced[20] == (True, SPECIAL.eos_id)  # position 21 ends sentence 0
    assert forced[21] == (True, SPECIAL.start_id)  # position 22 opens sentence 1
    assert forced[42] == (True, SPECIAL.eos_id)
    assert forced[43] == (True, SPECIAL.start_id)
    assert all(not f for i, (f, _) in enumerate(forced) if i not in (20, 21, 42, 43))


def test_pad_begets_pad():
    key = jax.random.PRNGKey(0)
    logits = jnp.zeros((2, 10))
    seen = jnp.zeros((2, 10), bool)
    last = jnp.asarray([SPECIAL.pad_id, 5])
    tok = sample_next_token(key, logits, seen, last, top_k=3)
    assert int(tok[0]) == SPECIAL.pad_id


# ---------------------------------------------------------------------------
# cached decode ≡ reference-style full re-forward decode
# ---------------------------------------------------------------------------


def _reference_style_decode(params, const, mcfg, dcfg, gcfg, batch, rng):
    """Slow oracle: re-forward the whole prefix per token, like
    generate.py:117-142, using the same per-step RNG stream."""
    B = batch["topic_ids"].shape[0]
    V = mcfg.gpt2.vocab_size
    tokens = np.full((B, gcfg.length + 1), 0, np.int32)
    tokens[:, 0] = SPECIAL.start_id
    seen = np.zeros((B, V), np.int32)
    seen[:, SPECIAL.start_id] = 1
    for i in range(gcfg.length):
        is_forced, forced = frame_forced_token(jnp.asarray(i), dcfg.sent_frame_length)
        if bool(is_forced):
            tok = np.full((B,), int(forced), np.int32)
        else:
            prefix = jnp.asarray(tokens[:, : i + 1])
            b = dict(batch, targets=prefix)
            out = mmtg_forward_infer(
                params, const, mcfg, dcfg, b, type_id_scheme=gcfg.type_id_scheme
            )
            logits = out.logits[:, -1]
            step_rng = jax.random.fold_in(rng, i)
            tok = np.asarray(
                sample_next_token(
                    step_rng,
                    logits,
                    jnp.asarray(seen),
                    jnp.asarray(tokens[:, i]),
                    temperature=gcfg.temperature,
                    top_k=gcfg.top_k,
                    top_p=gcfg.top_p,
                    repetition_penalty=gcfg.repetition_penalty,
                )
            )
        tokens[:, i + 1] = tok
        seen[np.arange(B), tok] += 1
    return tokens


@pytest.fixture(scope="module")
def gen_setup(request):
    tiny_model_cfg = request.getfixturevalue("tiny_model_cfg")
    tiny_data_cfg = request.getfixturevalue("tiny_data_cfg")
    tokenizer = request.getfixturevalue("tokenizer")
    rng = np.random.default_rng(7)
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    records = make_synthetic_records(2, rng, emb_size=tiny_data_cfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, tiny_data_cfg, if_train=False)
    batch = next(ds.batches(batch_size=2))
    batch.pop("sample_mask")
    V = tiny_model_cfg.gpt2.vocab_size
    for k in ("topic_ids", "targets"):
        batch[k] = np.minimum(batch[k], V - 1)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_mmtg_params(jax.random.PRNGKey(3), tiny_model_cfg)
    table = jax.random.normal(
        jax.random.PRNGKey(4), (V, tiny_data_cfg.wenlan_emb_size)
    )
    return params, {"wenlan_table": table}, tiny_model_cfg, tiny_data_cfg, jb


def test_cached_decode_matches_reference_style(gen_setup):
    # weight_dtype="model": this asserts EXACT token equality of the
    # KV-cached engine vs the per-token full re-forward, so both sides
    # must run full-precision weights (the 'auto' default resolves to
    # int8 at this batch size — covered by its own test below).
    params, const, mcfg, dcfg, jb = gen_setup
    gcfg = GenerateConfig(length=46, top_k=8, top_p=0.7, temperature=1.1,
                          repetition_penalty=1.5, weight_dtype="model")
    rng = jax.random.PRNGKey(11)
    fast = np.asarray(generate(params, const, mcfg, dcfg, gcfg, jb, rng))
    slow = _reference_style_decode(params, const, mcfg, dcfg, gcfg, jb, rng)
    np.testing.assert_array_equal(fast, slow)


def test_auto_weight_dtype_resolution(gen_setup):
    """'auto' → int8 at B ≤ 32 (the latency regime), model above; and the
    auto decode is token-identical to an explicit-int8 decode."""
    from mmtg_tpu.decoding import resolve_weight_dtype

    params, const, mcfg, dcfg, jb = gen_setup
    auto = GenerateConfig(length=46, top_k=8)
    assert auto.weight_dtype == "auto"
    assert resolve_weight_dtype(auto, 1) == "int8"
    assert resolve_weight_dtype(auto, 32) == "int8"
    assert resolve_weight_dtype(auto, 64) == "model"
    assert resolve_weight_dtype(
        GenerateConfig(weight_dtype="model"), 1) == "model"

    rng = jax.random.PRNGKey(11)
    got = np.asarray(generate(params, const, mcfg, dcfg, auto, jb, rng))
    explicit = np.asarray(generate(
        params, const, mcfg, dcfg,
        GenerateConfig(length=46, top_k=8, weight_dtype="int8"), jb, rng,
    ))
    np.testing.assert_array_equal(got, explicit)


def test_auto_cache_dtype_resolution(gen_setup):
    """'auto' cache → full precision at B = 1 (the op-count-bound xla
    regime, where the int8 quantize/scale-DUS/dequant chain is pure
    overhead — measured b1 91.9 ms fp vs 108.3 int8, docs/PERF.md
    "Round-4 latency regime"), int8 from B = 2 up; and the auto decode
    is token-identical to the explicit dtype it resolves to."""
    from mmtg_tpu.decoding import resolve_cache_dtype

    params, const, mcfg, dcfg, jb = gen_setup
    auto = GenerateConfig(length=46, top_k=8, cache_dtype="auto")
    assert resolve_cache_dtype(auto, 1) == "model"
    assert resolve_cache_dtype(auto, 2) == "int8"
    assert resolve_cache_dtype(auto, 512) == "int8"
    # any sharded context -> fp: the resolution must not depend on the
    # mesh shape, and the int8 cache's shard-local scales are not
    # TP-invariant (resolve_cache_dtype docstring)
    assert resolve_cache_dtype(auto, 512, sharded=True) == "model"
    assert resolve_cache_dtype(GenerateConfig(cache_dtype="int4"), 1) == "int4"
    assert resolve_cache_dtype(
        GenerateConfig(cache_dtype="int8"), 1, sharded=True) == "int8"

    rng = jax.random.PRNGKey(11)
    jb1 = {k: v[:1] for k, v in jb.items()}
    got_b1 = np.asarray(generate(params, const, mcfg, dcfg, auto, jb1, rng))
    fp_b1 = np.asarray(generate(
        params, const, mcfg, dcfg,
        GenerateConfig(length=46, top_k=8, cache_dtype="model"), jb1, rng,
    ))
    np.testing.assert_array_equal(got_b1, fp_b1)
    got_b2 = np.asarray(generate(params, const, mcfg, dcfg, auto, jb, rng))
    int8_b2 = np.asarray(generate(
        params, const, mcfg, dcfg,
        GenerateConfig(length=46, top_k=8, cache_dtype="int8"), jb, rng,
    ))
    np.testing.assert_array_equal(got_b2, int8_b2)


def test_auto_attn_impl_batch_gate(monkeypatch):
    """'auto' attention → XLA at decode batch 1 even on TPU backends
    (measured r04: the per-layer Pallas kernels' fixed DMA cost + the pad
    to 8 sublane rows lose there even unrolled — docs/PERF.md), Pallas at
    B ≥ 2 (where pallas + the unrolled layer loop wins); explicit
    'pallas' is never batch-gated."""
    import mmtg_tpu.decoding as dec

    monkeypatch.setattr(dec.jax, "default_backend", lambda: "tpu")
    auto = GenerateConfig(cache_dtype="int8")
    assert dec.resolve_attn_impl(auto, 768, batch_size=1) == "xla"
    assert dec.resolve_attn_impl(auto, 768, batch_size=2) == "pallas"
    assert dec.resolve_attn_impl(auto, 768, batch_size=8) == "pallas"
    # config-only reporting (no batch) keeps the platform resolution
    assert dec.resolve_attn_impl(auto, 768) == "pallas"
    forced = GenerateConfig(cache_dtype="int8", attn_impl="xla")
    assert dec.resolve_attn_impl(forced, 768, batch_size=512) == "xla"


def test_layer_unroll_resolution():
    """'auto' layer unroll → full on the pallas path at decode batches
    ≤ 32 (the op-count / loop-bookkeeping-bound regime where overlapped
    kernel DMA issue wins, docs/PERF.md "Round-4 latency regime"),
    rolled above and on every non-pallas path (XLA attention measured
    SLOWER unrolled); explicit values pass through as ints."""
    from mmtg_tpu.decoding import resolve_layer_unroll

    auto = GenerateConfig()
    assert resolve_layer_unroll(auto, 12, batch_size=2,
                                attn_impl="pallas") == 12
    assert resolve_layer_unroll(auto, 12, batch_size=32,
                                attn_impl="pallas") == 12
    assert resolve_layer_unroll(auto, 12, batch_size=33,
                                attn_impl="pallas") == 1
    assert resolve_layer_unroll(auto, 12, batch_size=512,
                                attn_impl="pallas") == 1
    # the XLA attention path never unrolls under 'auto'
    assert resolve_layer_unroll(auto, 12, batch_size=1, attn_impl="xla") == 1
    assert resolve_layer_unroll(auto, 12, batch_size=8, attn_impl="xla") == 1
    # config-only reporting (no batch) keeps the rolled loop
    assert resolve_layer_unroll(auto, 12, attn_impl="pallas") == 1
    forced = GenerateConfig(layer_unroll="4")
    assert resolve_layer_unroll(forced, 12, batch_size=512,
                                attn_impl="xla") == 4
    assert resolve_layer_unroll(GenerateConfig(layer_unroll="1"), 12,
                                batch_size=1, attn_impl="pallas") == 1


def test_decode_tokens_invariant_to_layer_unroll(gen_setup):
    """The unrolled layer loop is math-identical: same tokens as the
    rolled fori_loop on the same inputs (static layer slices replace
    dynamic indexing — no numeric change)."""
    params, const, mcfg, dcfg, jb = gen_setup
    rolled = GenerateConfig(length=36, top_k=5, layer_unroll="1")
    unrolled = dataclasses.replace(rolled, layer_unroll=str(mcfg.gpt2.n_layer))
    key = jax.random.PRNGKey(11)
    a = np.asarray(generate(params, const, mcfg, dcfg, rolled, jb, key))
    b = np.asarray(generate(params, const, mcfg, dcfg, unrolled, jb, key))
    np.testing.assert_array_equal(a, b)


def test_generate_stream_matches_generate(gen_setup):
    """Chunked streaming decode is bit-identical to the one-shot scan —
    the per-step PRNG keys on the GLOBAL step index, so any chunking of
    the step sequence (including a ragged last block) replays the same
    sample path. Also: one compiled chunk program serves every full-size
    block (traced ``start`` scalar)."""
    from mmtg_tpu.decoding import _stream_chunk_jit, generate_stream

    params, const, mcfg, dcfg, jb = gen_setup
    gcfg = GenerateConfig(length=46, top_k=8, top_p=0.7, temperature=1.1,
                          repetition_penalty=1.5)
    rng = jax.random.PRNGKey(11)
    oneshot = np.asarray(generate(params, const, mcfg, dcfg, gcfg, jb, rng))

    # chunk=20 over length=46 → blocks of 20/20/6 (ragged tail)
    blocks = list(generate_stream(params, const, mcfg, dcfg, gcfg, jb, rng,
                                  chunk=20))
    assert [b.shape[1] for b in blocks] == [20, 20, 6]
    streamed = np.concatenate([np.asarray(b) for b in blocks], axis=1)
    np.testing.assert_array_equal(streamed, oneshot[:, 1:])

    # full-size blocks share ONE compiled program (start is traced)
    sizes = _stream_chunk_jit._cache_size()
    blocks2 = list(generate_stream(params, const, mcfg, dcfg, gcfg, jb, rng,
                                   chunk=20))
    assert _stream_chunk_jit._cache_size() == sizes
    streamed2 = np.concatenate([np.asarray(b) for b in blocks2], axis=1)
    np.testing.assert_array_equal(streamed2, streamed)


def test_generate_stream_row_seeds(gen_setup):
    """Streaming with per-row seeds matches the one-shot row-seeded path
    (the serving layer's batch-composition invariance carries over)."""
    from mmtg_tpu.decoding import generate_stream

    params, const, mcfg, dcfg, jb = gen_setup
    gcfg = GenerateConfig(length=44, top_k=8)
    rng = jax.random.PRNGKey(5)
    seeds = jnp.asarray([17, 23], jnp.int32)
    oneshot = np.asarray(
        generate(params, const, mcfg, dcfg, gcfg, jb, rng, row_seeds=seeds)
    )
    streamed = np.concatenate(
        [np.asarray(b) for b in generate_stream(
            params, const, mcfg, dcfg, gcfg, jb, rng, row_seeds=seeds,
            chunk=22)],
        axis=1,
    )
    np.testing.assert_array_equal(streamed, oneshot[:, 1:])


def test_generated_frame_structure(gen_setup):
    params, const, mcfg, dcfg, jb = gen_setup
    gcfg = GenerateConfig(length=68, top_k=5)
    toks = np.asarray(
        generate(params, const, mcfg, dcfg, gcfg, jb, jax.random.PRNGKey(1))
    )
    # sentence grid: position 22k = START, position 22k+21 = EOS
    for k in range(toks.shape[1] // 22):
        assert (toks[:, 22 * k] == SPECIAL.start_id).all()
        if 22 * k + 21 < toks.shape[1]:
            assert (toks[:, 22 * k + 21] == SPECIAL.eos_id).all()
    banned = {SPECIAL.unk_id, SPECIAL.sep_id}
    inner = [t for row in toks for j, t in enumerate(row) if j % 22 not in (0, 21)]
    assert banned.isdisjoint(set(int(x) for x in inner))


def test_postprocess(tokenizer):
    # two framed sentences then SEP
    ids = [1] + tokenizer.convert_tokens_to_ids(list("青山一道")) + [0] * 16 + [2]
    ids += [1] + tokenizer.convert_tokens_to_ids(list("明月何曾")) + [0] * 16 + [2]
    ids += [tokenizer.sep_token_id]
    s = postprocess_tokens(ids, tokenizer)
    assert s == "青山一道，明月何曾"


def test_topk_subspace_sampling_distribution(rng):
    """The [B,k]-subspace draw must induce exactly the softmax of the
    full filtered logits (same distribution as the reference pipeline)."""
    from mmtg_tpu.ops.sampling import _nucleus_mask_sorted

    B, V, k, p = 3, 50, 8, 0.7
    logits = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32) * 3)
    full = jax.nn.softmax(top_k_top_p_filter(logits, top_k=k, top_p=p), axis=-1)

    vals, idx = jax.lax.top_k(logits, k)
    vals = _nucleus_mask_sorted(vals, p)
    sub = jax.nn.softmax(vals, axis=-1)
    scattered = jnp.zeros((B, V)).at[jnp.arange(B)[:, None], idx].set(sub)
    np.testing.assert_allclose(np.asarray(scattered), np.asarray(full), atol=1e-6)


def test_int8_cache_decode(gen_setup):
    """int8 KV cache: structure intact, high token agreement with the
    full-precision decode (quantization perturbs the sampling
    distribution only slightly)."""
    params, const, mcfg, dcfg, jb = gen_setup
    rng = jax.random.PRNGKey(21)
    base = np.asarray(generate(
        params, const, mcfg, dcfg,
        GenerateConfig(length=46, top_k=8, attn_impl="xla"), jb, rng,
    ))
    q8 = np.asarray(generate(
        params, const, mcfg, dcfg,
        GenerateConfig(length=46, top_k=8, attn_impl="xla", cache_dtype="int8"),
        jb, rng,
    ))
    assert q8.shape == base.shape
    # frame grid intact
    assert (q8[:, 0] == SPECIAL.start_id).all()
    assert (q8[:, 21] == SPECIAL.eos_id).all()
    assert (q8[:, 22] == SPECIAL.start_id).all()
    # same RNG + small perturbation → most tokens agree
    agreement = (q8 == base).mean()
    assert agreement > 0.6, agreement


def test_int4_cache_decode(gen_setup):
    """int4 packed KV cache through the XLA fallback path: structure
    intact, token agreement with the full-precision decode above a floor.

    NB on the bar: this fixture model is RANDOM-INIT, where near-uniform
    logits make trajectories chaotically divergent — agreement here is a
    smoke floor, not the quality statement. The MEASURED quality statement
    lives in docs/QUALITY_LOOP.json (tools/quality_loop.py): on a trained
    model, int8 decode is token-identical to fp (BLEU2 1.0) and int4
    scores BLEU2 ≈ 0.87 vs the fp decode — asserted in
    tests/test_quality_loop.py."""
    params, const, mcfg, dcfg, jb = gen_setup
    rng = jax.random.PRNGKey(21)
    base = np.asarray(generate(
        params, const, mcfg, dcfg,
        GenerateConfig(length=46, top_k=8, attn_impl="xla"), jb, rng,
    ))
    q4 = np.asarray(generate(
        params, const, mcfg, dcfg,
        GenerateConfig(length=46, top_k=8, attn_impl="xla", cache_dtype="int4"),
        jb, rng,
    ))
    assert q4.shape == base.shape
    assert (q4[:, 0] == SPECIAL.start_id).all()
    assert (q4[:, 21] == SPECIAL.eos_id).all()
    assert (q4[:, 22] == SPECIAL.start_id).all()
    agreement = (q4 == base).mean()
    assert agreement > 0.4, agreement


def test_quantize_rows_roundtrip(rng):
    from mmtg_tpu.models.gpt2 import quantize_rows

    x = jnp.asarray(rng.standard_normal((4, 7, 64)).astype(np.float32)) * 3
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.max(np.abs(np.asarray(deq - x)))
    assert err <= float(jnp.max(s)) * 0.5 + 1e-6  # within half a quantum


def test_postprocess_edge_cases(tokenizer):
    sep = tokenizer.sep_token_id
    # 10+ EOS, no SEP before the 10th → cut at the 10th EOS
    ids = []
    for _ in range(11):
        ids += [1] + tokenizer.convert_tokens_to_ids(list("山")) + [2]
    s = postprocess_tokens(ids, tokenizer)
    assert s.count("，") == 9 and s.replace("，", "") == "山" * 10
    # early SEP wins when fewer than 10 EOS precede it
    ids2 = [1] + tokenizer.convert_tokens_to_ids(list("月")) + [2, sep, 9, 9]
    assert postprocess_tokens(ids2, tokenizer) == "月"
    # no EOS and no SEP at all → everything kept, specials stripped
    ids3 = tokenizer.convert_tokens_to_ids(list("天涯"))
    assert postprocess_tokens(ids3, tokenizer) == "天涯"


def test_exact_top_k_grouped_matches_lax(rng):
    """The grouped two-stage top-k (now a tools/ probe utility — measured
    14% SLOWER in-program at vocab 13317, docs/PERF.md dead-ends; its
    hypothesized regime is the English variant's vocab 50257) stays exact
    vs lax.top_k."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from probe_topk import exact_top_k_grouped

    x = jnp.asarray(rng.standard_normal((4, 13317)).astype(np.float32))
    for k in (1, 10, 64):
        v, i = exact_top_k_grouped(x, k)
        rv, ri = jax.lax.top_k(x, k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))

def test_int8_weight_decode(gen_setup):
    """Weight-only int8 decode (--weight_dtype int8): per-step LOGITS stay
    close to full precision under teacher forcing (the deterministic
    surface — on a random-init fixture near-uniform logits make sampled
    TRAJECTORIES chaotically divergent for any perturbation, so token
    agreement is not a meaningful metric here; cf. the int4 cache note
    above and the trained-model BLEU table in docs/QUALITY_LOOP.json)."""
    from mmtg_tpu.decoding import teacher_forced_decode_logits
    from mmtg_tpu.models.gpt2 import quantize_decode_weights

    params, const, mcfg, dcfg, jb = gen_setup
    tokens = np.asarray(jb["targets"])[:, :24].copy()
    tokens[:, 0] = SPECIAL.start_id
    base = np.asarray(teacher_forced_decode_logits(
        params, const, mcfg, dcfg, GenerateConfig(attn_impl="xla"),
        jb, jnp.asarray(tokens),
    ))
    qparams = dict(params, gpt2=quantize_decode_weights(params["gpt2"]))
    w8 = np.asarray(teacher_forced_decode_logits(
        qparams, const, mcfg, dcfg, GenerateConfig(attn_impl="xla"),
        jb, jnp.asarray(tokens),
    ))
    # int8 per-channel weight error is ~0.4% per matmul; through 2 layers
    # + the LM head the logit deviation stays small relative to the
    # logit scale
    scale = np.abs(base).max()
    rel = np.abs(w8 - base).max() / scale
    assert rel < 0.05, rel
    # the top-1 next-token prediction is preserved almost everywhere
    top1_match = (base.argmax(-1) == w8.argmax(-1)).mean()
    assert top1_match > 0.9, top1_match

    # direct numeric check: quantized weights reconstruct to within half
    # a quantization step of the per-channel scale
    qp = qparams["gpt2"]
    w = np.asarray(params["gpt2"]["h"]["attn_w"], np.float32)
    deq = np.asarray(qp["h"]["attn_w_q"], np.float32) * np.asarray(qp["h"]["attn_w_s"])
    assert np.abs(w - deq).max() <= np.asarray(qp["h"]["attn_w_s"]).max() * 0.51
