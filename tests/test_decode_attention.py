"""Pallas decode-attention kernel vs the XLA masked-softmax oracle
(interpret mode on the CPU test mesh; the real TPU path is exercised by
bench.py and the generation CLIs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtg_tpu.ops.decode_attention import decode_attention

L, B, T, NH, HD = 3, 8, 256, 4, 32
D = NH * HD


def _oracle(q, k, v, key_mask, position, layer):
    scale = 1.0 / np.sqrt(HD)
    kl = k[layer].reshape(B, T, NH, HD).astype(jnp.float32)
    vl = v[layer].reshape(B, T, NH, HD).astype(jnp.float32)
    qh = q.reshape(B, NH, HD).astype(jnp.float32)
    s = jnp.einsum("bhd,bthd->bht", qh, kl) * scale
    col = jnp.arange(T)[None, None, :]
    valid = (col <= position) & (key_mask[:, None, :] != 0)
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bht,bthd->bhd", p, vl)
    return ctx.reshape(B, D).astype(q.dtype)


@pytest.fixture(scope="module")
def tensors():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, D), jnp.float32)
    k = jax.random.normal(ks[1], (L, B, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (L, B, T, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("position", [0, 5, 63, 64, 200, 255])
@pytest.mark.parametrize("layer", [0, 2])
def test_kernel_matches_oracle(position, layer, tensors, rng):
    q, k, v = tensors
    mask = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.int32).at[:, 0].set(1)
    out = decode_attention(
        q, k, v, mask, jnp.asarray(position), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )
    ref = _oracle(q, k, v, mask, position, layer)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_ignores_garbage_beyond_position(tensors):
    """Slots past `position` must not influence the result even when they
    contain huge values (they are either masked or never read)."""
    q, k, v = tensors
    mask = jnp.ones((B, T), jnp.int32)
    pos = 30
    args = dict(n_head=NH, tile_t=64, interpret=True)
    out_clean = decode_attention(
        q, k, v, mask, jnp.asarray(pos), jnp.asarray(1), **args
    )
    k_dirty = k.at[:, :, pos + 1 :, :].set(1e4)
    v_dirty = v.at[:, :, pos + 1 :, :].set(-1e4)
    out_dirty = decode_attention(
        q, k_dirty, v_dirty, mask, jnp.asarray(pos), jnp.asarray(1), **args
    )
    np.testing.assert_allclose(np.asarray(out_clean), np.asarray(out_dirty))


def test_bf16(tensors):
    q, k, v = (t.astype(jnp.bfloat16) for t in tensors)
    mask = jnp.ones((B, T), jnp.int32)
    out = decode_attention(
        q, k, v, mask, jnp.asarray(90), jnp.asarray(0), n_head=NH,
        tile_t=64, interpret=True,
    )
    ref = _oracle(q, k, v, mask, 90, 0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_int8_kernel_matches_dequant_oracle(tensors, rng):
    from mmtg_tpu.models.gpt2 import quantize_rows
    from mmtg_tpu.ops.decode_attention import decode_attention_int8

    q, k, v = tensors
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    mask = jnp.ones((B, T), jnp.int32)
    pos, layer = 130, 1
    out = decode_attention_int8(
        q, kq, vq, ks, vs, mask, jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )
    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    ref = _oracle(q, k_deq, v_deq, mask, pos, layer)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_int4_pack_roundtrip(rng):
    from mmtg_tpu.models.gpt2 import quantize_rows_int4, unpack_int4

    x = jnp.asarray(rng.standard_normal((3, 5, D)), jnp.float32)
    packed, scale = quantize_rows_int4(x)
    assert packed.shape == (3, 5, D // 2) and packed.dtype == jnp.int8
    deq = unpack_int4(packed) * scale[..., None]
    # worst-case int4 error is scale/2 = absmax/14 per element
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(deq - x)) <= amax / 14 + 1e-6).all()
    # nibble values stay in the symmetric range
    unpacked = np.asarray(unpack_int4(packed))
    assert unpacked.min() >= -7 and unpacked.max() <= 7


def test_int4_kernel_matches_dequant_oracle(tensors, rng):
    from mmtg_tpu.models.gpt2 import quantize_rows_int4, unpack_int4
    from mmtg_tpu.ops.decode_attention import decode_attention_int4

    q, k, v = tensors
    kq, ks = quantize_rows_int4(k)
    vq, vs = quantize_rows_int4(v)
    mask = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.int32).at[:, 0].set(1)
    for pos, layer in [(0, 0), (63, 1), (130, 1), (255, 2)]:
        out = decode_attention_int4(
            q, kq, vq, ks, vs, mask, jnp.asarray(pos), jnp.asarray(layer),
            n_head=NH, block_b=4, tile_t=64, interpret=True,
        )
        k_deq = unpack_int4(kq) * ks[..., None]
        v_deq = unpack_int4(vq) * vs[..., None]
        ref = _oracle(q, k_deq, v_deq, mask, pos, layer)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4,
            err_msg=f"pos={pos} layer={layer}",
        )


def test_int8_append_kernel_matches_unfused(tensors, rng):
    """Fused append+attend == (quantize_rows + cache write + int8 kernel),
    including the in-place cache/scale updates at `position`."""
    from mmtg_tpu.models.gpt2 import quantize_rows
    from mmtg_tpu.ops.decode_attention import (
        decode_attention_int8,
        decode_attention_int8_append,
    )

    q, k, v = tensors
    pos, layer = 130, 1
    kq, ks = quantize_rows(k)
    vq, vs = quantize_rows(v)
    # garbage at `position` — the kernel must overwrite it before attending
    kq = kq.at[:, :, pos, :].set(77)
    vq = vq.at[:, :, pos, :].set(-77)
    ks = ks.at[:, :, pos].set(3.3)
    vs = vs.at[:, :, pos].set(3.3)
    k_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    mask = jnp.ones((B, T), jnp.int32)

    # oracle FIRST (the fused call donates/deletes the cache inputs):
    # write quantized rows the XLA way, then run the plain kernel
    knq, kns = quantize_rows(k_new)
    vnq, vns = quantize_rows(v_new)
    kq_ref = kq.at[layer, :, pos, :].set(knq)
    vq_ref = vq.at[layer, :, pos, :].set(vnq)
    ks_ref = ks.at[layer, :, pos].set(kns)
    vs_ref = vs.at[layer, :, pos].set(vns)
    ref = decode_attention_int8(
        q, kq_ref, vq_ref, ks_ref, vs_ref, mask,
        jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )
    untouched = np.asarray(kq[layer, :, pos + 1])

    out, kq2, vq2, ks2, vs2 = decode_attention_int8_append(
        q, k_new, v_new, kq, vq, ks, vs, mask,
        jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, sub_tiles=4, interpret=True,
        score_dtype="float32",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # the updated caches match the XLA-sequence caches exactly
    np.testing.assert_array_equal(np.asarray(kq2[layer, :, pos]), np.asarray(knq))
    np.testing.assert_array_equal(np.asarray(vq2[layer, :, pos]), np.asarray(vnq))
    np.testing.assert_allclose(np.asarray(ks2[layer, :, pos]), np.asarray(kns), rtol=1e-6)
    # untouched slots stay put
    np.testing.assert_array_equal(np.asarray(kq2[layer, :, pos + 1]), untouched)
    # the bfloat16 score-dot option (kept for the r03 measurement — it
    # LOST on hardware, docs/PERF.md) stays within bf16 rounding of f32
    # (this call donates kq2/vq2/ks2/vs2, so it runs after the asserts)
    out_bf, kq3, vq3, ks3, vs3 = decode_attention_int8_append(
        q, k_new, v_new, kq2, vq2, ks2, vs2, mask,
        jnp.asarray(pos + 1), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, sub_tiles=4, interpret=True,
        score_dtype="bfloat16",
    )
    out_f32ref = decode_attention_int8(
        q, kq3, vq3, ks3, vs3, mask, jnp.asarray(pos + 1), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_bf), np.asarray(out_f32ref), atol=1e-2
    )


def test_fp_append_kernel_matches_unfused(tensors, rng):
    """Full-precision fused append == (cache write + plain kernel)."""
    from mmtg_tpu.ops.decode_attention import (
        decode_attention,
        decode_attention_fp_append,
    )

    q, k, v = tensors
    pos, layer = 130, 1
    k_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    mask = jnp.ones((B, T), jnp.int32)
    # garbage at `position` — the kernel must overwrite it before attending
    k_dirty = k.at[:, :, pos, :].set(1e3)
    v_dirty = v.at[:, :, pos, :].set(-1e3)

    k_ref = k_dirty.at[layer, :, pos, :].set(k_new)
    v_ref = v_dirty.at[layer, :, pos, :].set(v_new)
    ref = decode_attention(
        q, k_ref, v_ref, mask, jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )
    untouched = np.asarray(k_dirty[layer, :, pos + 1])

    out, k2, v2 = decode_attention_fp_append(
        q, k_new, v_new, k_dirty, v_dirty, mask,
        jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(k2[layer, :, pos]), np.asarray(k_new), atol=0)
    np.testing.assert_array_equal(np.asarray(k2[layer, :, pos + 1]), untouched)


def test_int4_append_kernel_matches_unfused(tensors, rng):
    """int4 fused append == (quantize_rows_int4 + cache write + int4 kernel)."""
    from mmtg_tpu.models.gpt2 import quantize_rows_int4
    from mmtg_tpu.ops.decode_attention import (
        decode_attention_int4,
        decode_attention_int4_append,
    )

    q, k, v = tensors
    pos, layer = 130, 1
    kq, ks = quantize_rows_int4(k)
    vq, vs = quantize_rows_int4(v)
    kq = kq.at[:, :, pos, :].set(77)
    ks = ks.at[:, :, pos].set(3.3)
    k_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    mask = jnp.ones((B, T), jnp.int32)

    knq, kns = quantize_rows_int4(k_new)
    vnq, vns = quantize_rows_int4(v_new)
    kq_ref = kq.at[layer, :, pos, :].set(knq)
    vq_ref = vq.at[layer, :, pos, :].set(vnq)
    ks_ref = ks.at[layer, :, pos].set(kns)
    vs_ref = vs.at[layer, :, pos].set(vns)
    ref = decode_attention_int4(
        q, kq_ref, vq_ref, ks_ref, vs_ref, mask,
        jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )

    out, kq2, vq2, ks2, vs2 = decode_attention_int4_append(
        q, k_new, v_new, kq, vq, ks, vs, mask,
        jnp.asarray(pos), jnp.asarray(layer),
        n_head=NH, block_b=4, tile_t=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(kq2[layer, :, pos]), np.asarray(knq))
    np.testing.assert_allclose(np.asarray(ks2[layer, :, pos]), np.asarray(kns), rtol=1e-6)


def test_int8_merged_kv_matches_split(rng):
    """Merged-KV kernel (k||v in one [L,B,T,2D] buffer, one DMA per
    sub-tile) is BIT-identical to the split int8 append kernel: same ctx,
    same appended rows/scales, in every tile-count regime."""
    from mmtg_tpu.ops.decode_attention import (
        decode_attention_int8_append,
        decode_attention_int8_append_merged,
    )

    L, B, T, D, NH = 2, 8, 256, 256, 4
    layer = 1
    for pos in (3, 16, 31, 100, 254):
        q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        kc = rng.integers(-127, 127, (L, B, T, D)).astype(np.int8)
        vc = rng.integers(-127, 127, (L, B, T, D)).astype(np.int8)
        ks = (rng.random((L, B, T)) * 0.02 + 1e-3).astype(np.float32)
        vs = (rng.random((L, B, T)) * 0.02 + 1e-3).astype(np.float32)
        km = jnp.ones((B, T), jnp.int32)
        ref = decode_attention_int8_append(
            q, kn, vn, jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(ks), jnp.asarray(vs), km,
            jnp.int32(pos), jnp.int32(layer),
            n_head=NH, block_b=4, tile_t=64, sub_tiles=4, interpret=True,
        )
        out = decode_attention_int8_append_merged(
            q, kn, vn, jnp.asarray(np.concatenate([kc, vc], axis=-1)),
            jnp.asarray(ks), jnp.asarray(vs), km,
            jnp.int32(pos), jnp.int32(layer),
            n_head=NH, block_b=4, tile_t=64, sub_tiles=4, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
        kv2 = np.asarray(out[1])
        np.testing.assert_array_equal(kv2[..., :D], np.asarray(ref[1]))
        np.testing.assert_array_equal(kv2[..., D:], np.asarray(ref[2]))
        np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[3]))
        np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(ref[4]))
