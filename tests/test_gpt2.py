"""GPT-2 core: logits parity vs HF GPT2LMHeadModel (the exact module the
reference drives via inputs_embeds/token_type_ids/attention_mask,
reference model.py:219, :282-288), plus KV-cache decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.configs import GPT2Config
from mmtg_tpu.models.gpt2 import (
    gpt2_decode_step,
    gpt2_forward,
    import_hf_gpt2,
    init_cache,
    init_gpt2_params,
    prefill_cache,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = GPT2Config(vocab_size=120, n_positions=64, n_ctx=64, n_embd=32, n_layer=2, n_head=4)


@pytest.fixture(scope="module")
def hf_pair():
    hf_cfg = transformers.GPT2Config(
        vocab_size=CFG.vocab_size,
        n_positions=CFG.n_positions,
        n_embd=CFG.n_embd,
        n_layer=CFG.n_layer,
        n_head=CFG.n_head,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    params = import_hf_gpt2(hf.state_dict(), CFG)
    return hf, params


def test_logits_parity_with_hf(hf_pair):
    hf, params = hf_pair
    B, T, D = 2, 10, CFG.n_embd
    torch.manual_seed(1)
    embeds = torch.randn(B, T, D)
    type_ids = torch.randint(0, 6, (B, T))
    mask = torch.ones(B, T, dtype=torch.long)
    mask[0, -3:] = 0  # padding on row 0

    with torch.no_grad():
        ref = hf(
            inputs_embeds=embeds,
            token_type_ids=type_ids,
            attention_mask=mask,
            return_dict=True,
        ).logits.numpy()

    logits, _ = gpt2_forward(
        params,
        CFG,
        jnp.asarray(embeds.numpy()),
        jnp.arange(T)[None, :],
        jnp.asarray(type_ids.numpy()),
        jnp.asarray(mask.numpy()),
    )
    # Only compare non-pad query positions: HF computes pad-position rows
    # too but they are meaningless and depend on mask details.
    np.testing.assert_allclose(np.asarray(logits)[:, :7], ref[:, :7], atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits)[1], ref[1], atol=2e-4)


def test_lm_loss_matches_hf(hf_pair):
    hf, params = hf_pair
    B, T, D = 2, 8, CFG.n_embd
    torch.manual_seed(2)
    embeds = torch.randn(B, T, D)
    labels = torch.randint(0, CFG.vocab_size, (B, T))
    with torch.no_grad():
        out = hf(inputs_embeds=embeds, labels=labels, return_dict=True)
    logits, _ = gpt2_forward(
        params, CFG, jnp.asarray(embeds.numpy()), jnp.arange(T)[None, :]
    )
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.asarray(labels.numpy())[:, 1:, None], axis=-1
    )
    np.testing.assert_allclose(float(nll.mean()), float(out.loss), atol=2e-5)


def test_kv_cache_decode_matches_full_forward(hf_pair):
    """Prefill + per-token cached decode == full forward at every step."""
    _, params = hf_pair
    B, T0, T, D = 2, 4, 12, CFG.n_embd
    key = jax.random.PRNGKey(0)
    embeds = jax.random.normal(key, (B, T, D))
    type_ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    full_logits, _ = gpt2_forward(
        params, CFG, embeds, jnp.arange(T)[None, :], type_ids, mask
    )

    capacity = 16
    pre_logits, cache = prefill_cache(
        params, CFG, embeds[:, :T0], jnp.arange(T0)[None, :], type_ids[:, :T0],
        mask[:, :T0], capacity,
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :T0]), atol=1e-5
    )

    key_mask = jnp.zeros((B, capacity), jnp.int32).at[:, :T0].set(1)
    for t in range(T0, T):
        key_mask = key_mask.at[:, t].set(1)
        step_logits, cache = gpt2_decode_step(
            params,
            CFG,
            cache,
            embeds[:, t],
            jnp.asarray(t),
            type_ids[:, t],
            key_mask,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_logits[:, t]), atol=1e-4
        )


def test_forward_jits_and_grads():
    params = init_gpt2_params(jax.random.PRNGKey(0), CFG)
    B, T = 2, 6
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.n_embd))

    @jax.jit
    def loss_fn(p):
        logits, _ = gpt2_forward(p, CFG, embeds, jnp.arange(T)[None, :])
        return jnp.mean(logits**2)

    g = jax.grad(loss_fn)(params)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))


def test_dropout_determinism():
    params = init_gpt2_params(jax.random.PRNGKey(0), CFG)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 4, CFG.n_embd))
    rng = jax.random.PRNGKey(42)
    a, _ = gpt2_forward(
        params, CFG, embeds, jnp.arange(4)[None, :], dropout_rng=rng, deterministic=False
    )
    b, _ = gpt2_forward(
        params, CFG, embeds, jnp.arange(4)[None, :], dropout_rng=rng, deterministic=False
    )
    c, _ = gpt2_forward(params, CFG, embeds, jnp.arange(4)[None, :])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
