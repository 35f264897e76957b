"""Fused train-attention Pallas kernel vs a pure-jax oracle (interpret
mode), plus end-to-end gpt2_forward pallas-vs-xla equivalence.

The kernel replaces HF GPT2Attention train semantics (causal mask +
additive key-padding bias + f32 softmax + dropout; reference drives it
via ``model.py:282-288``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import GPT2Config
from mmtg_tpu.models.gpt2 import gpt2_forward, init_gpt2_params
from mmtg_tpu.ops import train_attention as ta


@pytest.fixture(autouse=True)
def _interpret_mode():
    ta.INTERPRET = True
    yield
    ta.INTERPRET = False


def _to_slab(q, k, v, hd):
    """[B,H,T,hd] ×3 → [B,T,H*384] head-major padded slab."""
    B, H, T, _ = q.shape
    out = np.zeros((B, T, H, 3, ta.LANES), np.float32)
    out[:, :, :, 0, :hd] = q.transpose(0, 2, 1, 3)
    out[:, :, :, 1, :hd] = k.transpose(0, 2, 1, 3)
    out[:, :, :, 2, :hd] = v.transpose(0, 2, 1, 3)
    return jnp.asarray(out.reshape(B, T, H * ta.SLAB))


def _oracle(q, k, v, mask, scale):
    T = q.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    b = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, ta.NEG_INF)[None, None]
    b = b + ((1.0 - mask) * ta.NEG_INF)[:, None, None, :]
    p = jax.nn.softmax(s + b, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("B,H,T,hd", [(2, 3, 128, 64), (4, 2, 256, 64), (2, 2, 128, 128)])
def test_forward_matches_oracle(B, H, T, hd):
    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (rng.standard_normal((B, H, T, hd)).astype(np.float32) for _ in range(3))
    mask = np.ones((B, T), np.float32)
    mask[:, T - 9:] = 0.0
    bias = jnp.asarray((1.0 - mask) * ta.NEG_INF)
    seed = jnp.zeros((1,), jnp.int32)

    zb = jnp.zeros((H * ta.SLAB,), jnp.float32)
    out = ta.mha_train(_to_slab(q, k, v, hd), zb, bias, seed, H, 0.0, float(scale))
    out_h = np.asarray(out).reshape(B, T, H, ta.LANES).transpose(0, 2, 1, 3)[..., :hd]
    ref = np.asarray(_oracle(*(jnp.asarray(t) for t in (q, k, v)), jnp.asarray(mask), scale))
    np.testing.assert_allclose(out_h, ref, atol=2e-6)
    # pad lanes must stay zero (v pad lanes are zero)
    pads = np.asarray(out).reshape(B, T, H, ta.LANES)[..., hd:]
    assert pads.size == 0 or np.abs(pads).max() == 0.0


def test_backward_matches_oracle():
    B, H, T, hd = 2, 3, 128, 64
    rng = np.random.default_rng(1)
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (rng.standard_normal((B, H, T, hd)).astype(np.float32) for _ in range(3))
    mask = np.ones((B, T), np.float32)
    mask[:, T - 5:] = 0.0
    bias = jnp.asarray((1.0 - mask) * ta.NEG_INF)
    seed = jnp.zeros((1,), jnp.int32)
    slab = _to_slab(q, k, v, hd)
    # cotangent only on real lanes (pad-lane cotangents are zero in the
    # model: the output projection's pad rows are zero)
    co_h = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    co = np.zeros((B, T, H, ta.LANES), np.float32)
    co[..., :hd] = co_h.transpose(0, 2, 1, 3)
    co = jnp.asarray(co.reshape(B, T, H * ta.LANES))
    zb = jnp.zeros((H * ta.SLAB,), jnp.float32)

    g = jax.grad(
        lambda s: jnp.sum(ta.mha_train(s, zb, bias, seed, H, 0.0, float(scale)) * co)
    )(slab)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(_oracle(q, k, v, jnp.asarray(mask), scale)
                                * jnp.asarray(co_h)),
        argnums=(0, 1, 2),
    )(*(jnp.asarray(t) for t in (q, k, v)))
    g5 = np.asarray(g).reshape(B, T, H, 3, ta.LANES)
    for j in range(3):
        got = g5[:, :, :, j, :hd].transpose(0, 2, 1, 3)
        np.testing.assert_allclose(got, np.asarray(gr[j]), atol=2e-6)
    assert np.abs(g5[..., hd:]).max() == 0.0

    # the in-kernel partial-sum bias grad must equal colsum(dqkv)
    # (qkv_eff = qkv + bias ⇒ d bias = Σ_{B,T} dqkv)
    _, dzb = jax.grad(
        lambda s, b: jnp.sum(ta.mha_train(s, b, bias, seed, H, 0.0,
                                          float(scale)) * co),
        argnums=(0, 1),
    )(slab, zb)
    np.testing.assert_allclose(
        np.asarray(dzb), np.asarray(g).sum(axis=(0, 1)), atol=1e-4
    )


def test_pad_qkv_weights_layout():
    """a @ padded_w + padded_b reproduces the head-major q|k|v slabs."""
    D, H, hd, B, T = 16, 3, 64, 2, 8
    rng = np.random.default_rng(2)
    w = rng.standard_normal((D, 3 * H * hd)).astype(np.float32)
    bvec = rng.standard_normal((3 * H * hd,)).astype(np.float32)
    a = rng.standard_normal((B, T, D)).astype(np.float32)
    wp, bp = ta.pad_qkv_weights(jnp.asarray(w), jnp.asarray(bvec), H, hd)
    slab = np.asarray(a @ np.asarray(wp) + np.asarray(bp))
    slab = slab.reshape(B, T, H, 3, ta.LANES)
    ref = (a @ w + bvec).reshape(B, T, 3, H, hd)
    np.testing.assert_allclose(
        slab[..., :hd], ref.transpose(0, 1, 3, 2, 4), atol=1e-5
    )
    assert np.abs(slab[..., hd:]).max() == 0.0


def test_gpt2_forward_pallas_matches_xla():
    """Deterministic full-stack forward: pallas kernel path == xla path
    (also exercises the T→128-multiple sequence padding glue)."""
    cfg = GPT2Config(vocab_size=97, n_positions=64, n_embd=64, n_layer=2,
                     n_head=2)
    params = init_gpt2_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 37
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.n_embd)) * 0.1
    pos = jnp.arange(T)
    mask = jnp.ones((B, T), jnp.int32).at[1, 30:].set(0)
    logits_x, _ = gpt2_forward(params, cfg, emb, pos, attention_mask=mask,
                               attn_impl="xla")
    logits_p, _ = gpt2_forward(params, cfg, emb, pos, attention_mask=mask,
                               attn_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_x), atol=2e-5
    )


# ---------------------------------------------------------------------------
# packed (unpadded, standard-order slab) variant
# ---------------------------------------------------------------------------


def _to_packed_slab(q, k, v):
    """[B,H,T,hd] ×3 → [B,T,3·H·hd] standard c_attn order (q|k|v)."""
    B, H, T, hd = q.shape
    merge = lambda t: t.transpose(0, 2, 1, 3).reshape(B, T, H * hd)
    return jnp.asarray(np.concatenate([merge(q), merge(k), merge(v)], -1))


@pytest.mark.parametrize("B,H,T,hd", [(2, 3, 128, 64), (4, 2, 256, 64)])
def test_packed_forward_matches_oracle(B, H, T, hd):
    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (rng.standard_normal((B, H, T, hd)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), np.float32)
    mask[:, T - 9:] = 0.0
    bias = jnp.asarray((1.0 - mask) * ta.NEG_INF)
    seed = jnp.zeros((1,), jnp.int32)
    zb = jnp.zeros((3 * H * hd,), jnp.float32)
    out = ta.mha_train_packed(
        _to_packed_slab(q, k, v), zb, bias, seed, H, 0.0, float(scale))
    out_h = np.asarray(out).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    ref = np.asarray(_oracle(*(jnp.asarray(t) for t in (q, k, v)),
                             jnp.asarray(mask), scale))
    np.testing.assert_allclose(out_h, ref, atol=2e-6)


def test_packed_backward_matches_oracle():
    B, H, T, hd = 2, 3, 128, 64
    rng = np.random.default_rng(1)
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (rng.standard_normal((B, H, T, hd)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), np.float32)
    mask[:, T - 5:] = 0.0
    bias = jnp.asarray((1.0 - mask) * ta.NEG_INF)
    seed = jnp.zeros((1,), jnp.int32)
    slab = _to_packed_slab(q, k, v)
    co_h = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    co = jnp.asarray(co_h.transpose(0, 2, 1, 3).reshape(B, T, H * hd))
    zb = jnp.zeros((3 * H * hd,), jnp.float32)

    g, dzb = jax.grad(
        lambda s, b: jnp.sum(
            ta.mha_train_packed(s, b, bias, seed, H, 0.0, float(scale)) * co),
        argnums=(0, 1),
    )(slab, zb)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(_oracle(q, k, v, jnp.asarray(mask), scale)
                                * jnp.asarray(co_h)),
        argnums=(0, 1, 2),
    )(*(jnp.asarray(t) for t in (q, k, v)))
    g3 = np.asarray(g).reshape(B, T, 3, H, hd)
    for j in range(3):
        np.testing.assert_allclose(
            g3[:, :, j].transpose(0, 2, 1, 3), np.asarray(gr[j]), atol=2e-6)
    # in-kernel partial-sum bias grad == colsum(dqkv)
    np.testing.assert_allclose(
        np.asarray(dzb), np.asarray(g).sum(axis=(0, 1)), atol=1e-4)


def test_packed_matches_padded_kernel():
    """Same math, two slab layouts: packed output == padded output."""
    B, H, T, hd = 2, 2, 128, 64
    rng = np.random.default_rng(5)
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (rng.standard_normal((B, H, T, hd)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), np.float32)
    mask[:, T - 3:] = 0.0
    bias = jnp.asarray((1.0 - mask) * ta.NEG_INF)
    seed = jnp.zeros((1,), jnp.int32)
    pad_out = ta.mha_train(
        _to_slab(q, k, v, hd), jnp.zeros((H * ta.SLAB,), jnp.float32),
        bias, seed, H, 0.0, float(scale))
    pk_out = ta.mha_train_packed(
        _to_packed_slab(q, k, v), jnp.zeros((3 * H * hd,), jnp.float32),
        bias, seed, H, 0.0, float(scale))
    pad_h = np.asarray(pad_out).reshape(B, T, H, ta.LANES)[..., :hd]
    pk_h = np.asarray(pk_out).reshape(B, T, H, hd)
    np.testing.assert_allclose(pk_h, pad_h, atol=2e-6)


def test_gpt2_forward_pallas_packed_matches_xla():
    cfg = GPT2Config(vocab_size=97, n_positions=64, n_embd=128, n_layer=2,
                     n_head=2)
    params = init_gpt2_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 37
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.n_embd)) * 0.1
    pos = jnp.arange(T)
    mask = jnp.ones((B, T), jnp.int32).at[1, 30:].set(0)
    logits_x, _ = gpt2_forward(params, cfg, emb, pos, attention_mask=mask,
                               attn_impl="xla")
    logits_p, _ = gpt2_forward(params, cfg, emb, pos, attention_mask=mask,
                               attn_impl="pallas_packed")
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_x), atol=2e-5
    )


def test_packed_dropout_deterministic_and_bwd_regenerates():
    B, H, T, hd = 2, 2, 128, 64
    rng = np.random.default_rng(6)
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (rng.standard_normal((B, H, T, hd)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), np.float32)
    mask[:, T - 5:] = 0.0
    bias = jnp.asarray((1.0 - mask) * ta.NEG_INF)
    slab = _to_packed_slab(q, k, v)
    zb = jnp.zeros((3 * H * hd,), jnp.float32)
    seed = jnp.full((1,), 7, jnp.int32)
    a = ta.mha_train_packed(slab, zb, bias, seed, H, 0.5, scale)
    b = ta.mha_train_packed(slab, zb, bias, seed, H, 0.5, scale)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = ta.mha_train_packed(slab, zb, bias, seed + 1, H, 0.5, scale)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0.0

    co = jnp.asarray(rng.standard_normal(np.asarray(a).shape)
                     .astype(np.float32))

    def loss(s):
        return jnp.sum(ta.mha_train_packed(s, zb, bias, seed, H, 0.5, scale)
                       * co)

    g = jax.grad(loss)(slab)
    # directional FD vs custom VJP (deterministic given fixed seed)
    d = jnp.asarray(rng.standard_normal(slab.shape).astype(np.float32))
    eps = 1e-3
    fd = float(loss(slab + eps * d) - loss(slab - eps * d)) / (2 * eps)
    an = float(jnp.sum(g * d))
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=5e-2)


# ---------------------------------------------------------------------------
# dropout (rate > 0): determinism + fwd/bwd mask regeneration
# ---------------------------------------------------------------------------


def _dropout_setup(T=128, B=2, H=2, hd=64, seed_val=7):
    rng = np.random.default_rng(3)
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (rng.standard_normal((B, H, T, hd)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), np.float32)
    mask[:, T - 5:] = 0.0
    bias = jnp.asarray((1.0 - mask) * ta.NEG_INF)
    slab = _to_slab(q, k, v, hd)
    zb = jnp.zeros((H * ta.SLAB,), jnp.float32)
    seed = jnp.full((1,), seed_val, jnp.int32)
    return slab, zb, bias, seed, H, float(scale)


def test_dropout_forward_deterministic_given_seed():
    """Same seed → bit-identical output; different seed → different mask.
    The kernel's dropout mask comes from the on-core PRNG seeded by
    (step seed, program id) and is never stored — determinism is the
    invariant that lets the backward kernel regenerate it."""
    slab, zb, bias, seed, H, scale = _dropout_setup()
    a = ta.mha_train(slab, zb, bias, seed, H, 0.5, scale)
    b = ta.mha_train(slab, zb, bias, seed, H, 0.5, scale)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = ta.mha_train(slab, zb, bias, seed + 1, H, 0.5, scale)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0.0
    # dropout actually drops: rate 0.5 output differs from rate 0
    d = ta.mha_train(slab, zb, bias, seed, H, 0.0, scale)
    assert np.abs(np.asarray(a) - np.asarray(d)).max() > 1e-3


def test_dropout_backward_regenerates_forward_mask():
    """fwd/bwd mask consistency without ever materializing the mask:

    (1) v-path linearity: out is linear in v for a fixed mask, so
        ⟨f(v), co⟩ must equal ⟨v, ∇_v⟨f(v), co⟩⟩ — if the backward kernel
        regenerated a DIFFERENT mask than the forward, this dot-product
        identity breaks.
    (2) full-slab directional finite difference vs the custom VJP: with a
        fixed seed the program is deterministic, so
        (f(x+εd) − f(x−εd)) / 2ε ≈ ⟨∇f, d⟩ across q, k AND v lanes.
    """
    slab, zb, bias, seed, H, scale = _dropout_setup()
    rng = np.random.default_rng(4)
    co = jnp.asarray(rng.standard_normal(
        np.asarray(ta.mha_train(slab, zb, bias, seed, H, 0.5, scale)).shape
    ).astype(np.float32))

    def loss(s):
        return jnp.sum(ta.mha_train(s, zb, bias, seed, H, 0.5, scale) * co)

    g = jax.grad(loss)(slab)

    # (1) v-path dot-product identity (exact up to f32 rounding)
    B, T, W = slab.shape
    v_dir = np.zeros((B, T, W), np.float32)
    s5 = np.asarray(slab).reshape(B, T, H, 3, ta.LANES)
    v5 = v_dir.reshape(B, T, H, 3, ta.LANES)
    v5[:, :, :, 2, :] = rng.standard_normal(v5[:, :, :, 2, :].shape)
    v_dir = jnp.asarray(v_dir)
    lhs = float(loss(slab + v_dir) - loss(slab))  # linear in v ⇒ exact Δ
    rhs = float(jnp.sum(g * v_dir))
    np.testing.assert_allclose(lhs, rhs, rtol=2e-3)

    # (2) directional FD over the whole slab (q, k, v lanes together)
    d = jnp.asarray(rng.standard_normal(slab.shape).astype(np.float32))
    eps = 1e-3
    fd = float(loss(slab + eps * d) - loss(slab - eps * d)) / (2 * eps)
    an = float(jnp.sum(g * d))
    np.testing.assert_allclose(fd, an, rtol=5e-3, atol=5e-2)
