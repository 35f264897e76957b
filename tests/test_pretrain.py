"""Phase-1 pretraining: corpus packing, LM loss, end-to-end tiny run, and
the Orbax handoff into the phase-2 trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtg_tpu.configs import GPT2Config
from mmtg_tpu.models.gpt2 import init_gpt2_params
from mmtg_tpu.pretrain import lm_loss, pack_corpus

CFG = GPT2Config(vocab_size=200, n_positions=64, n_embd=32, n_layer=2, n_head=4)


def test_pack_corpus(tokenizer):
    lines = ["青山一道同云雨", "明月何曾是两乡", "", "海内存知己"]
    rows = pack_corpus(lines, tokenizer, seq_len=16)
    assert rows.ndim == 2 and rows.shape[1] == 16
    # each framed sentence opens with [#START#]=1 and ends with [#EOS#]=2
    assert rows[0, 0] == 1
    flat = rows.flatten().tolist()
    assert flat.count(1) == 3 and flat.count(2) == 3  # empty line dropped


def test_pack_respects_row_boundary(tokenizer):
    lines = ["一二三四五六七"] * 4  # 9 ids each framed; 16-len rows fit 1
    rows = pack_corpus(lines, tokenizer, seq_len=16)
    assert len(rows) == 4


def test_pack_long_line_no_all_pad_row(tokenizer):
    # an over-long line arriving while cur is empty must not flush an
    # all-PAD row (wasted zero-weight steps)
    lines = ["一二三四五六七八九十一二三四五六七八九十"]  # 22 framed ids > 16
    rows = pack_corpus(lines, tokenizer, seq_len=16)
    assert len(rows) == 1
    assert (rows != 0).any(axis=1).all()  # no all-PAD rows
    # and the same at the front of a longer corpus
    rows2 = pack_corpus(lines + ["青山一道"], tokenizer, seq_len=16)
    assert (rows2 != 0).any(axis=1).all()


def test_lm_loss_pad_length_invariant():
    """Trailing PAD is masked out as both keys and targets: extending the
    pad tail must not change the loss."""
    params = init_gpt2_params(jax.random.PRNGKey(0), CFG)
    short = jnp.asarray([[1, 5, 6, 2, 0, 0, 0, 0]], jnp.int32)
    longer = jnp.asarray([[1, 5, 6, 2, 0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    a = float(lm_loss(params, CFG, short))
    b = float(lm_loss(params, CFG, longer))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    assert np.isfinite(a) and a > 0


def test_pretrain_cli_end_to_end(tmp_path, reference_vocab_path):
    corpus = tmp_path / "lyrics.txt"
    corpus.write_text(
        "\n".join(["青山一道同云雨", "明月何曾是两乡", "海内存知己", "天涯若比邻"] * 8),
        encoding="utf-8",
    )
    from mmtg_tpu import pretrain

    # tiny run: monkeypatch the model size via GPT2Config default? the CLI
    # builds a full-size model — too slow for CI, so drive the pieces:
    from mmtg_tpu.tokenizer import WordPieceTokenizer

    tk = WordPieceTokenizer.from_file(reference_vocab_path)
    rows = pack_corpus(corpus.read_text(encoding="utf-8").splitlines(), tk, 32)
    params = init_gpt2_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.minimum(jnp.asarray(rows[:4]), CFG.vocab_size - 1)
    l0 = float(lm_loss(params, CFG, ids))

    import optax

    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, b):
        loss, g = jax.value_and_grad(lm_loss)(p, CFG, b)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    for _ in range(10):
        params, opt, loss = step(params, opt, ids)
    assert float(loss) < l0  # the LM learns


def test_orbax_handoff(tmp_path):
    """pretrain's save format restores into the phase-2 trainer loader."""
    from mmtg_tpu.checkpoint import restore_train_state, save_train_state

    params = init_gpt2_params(jax.random.PRNGKey(1), CFG)
    save_train_state(str(tmp_path / "p1"), 7, {"gpt2": jax.device_get(params)})
    template = {"gpt2": init_gpt2_params(jax.random.PRNGKey(2), CFG)}
    restored, step = restore_train_state(str(tmp_path / "p1"), template)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["gpt2"]["wte"]), np.asarray(params["wte"])
    )


def test_pack_corpus_with_bpe_vocab(tmp_path):
    """Phase-1 pretraining accepts a byte-level BPE vocab dir (English
    variant): the polymorphic loader routes it and packing/framing work
    unchanged (reference README.md:19-20,86 + :83 two-phase regime)."""
    from mmtg_tpu.bpe import load_tokenizer, train_bpe

    corpus_lines = [
        "city lights are calling out my name",
        "we dance until the morning sun",
        "hold me closer while the music plays",
    ] * 6
    tok = train_bpe(corpus_lines, vocab_size=400)
    vocab_dir = tmp_path / "bpe"
    tok.save(str(vocab_dir))
    loaded = load_tokenizer(str(vocab_dir))
    rows = pack_corpus(corpus_lines, loaded, 32)
    assert len(rows) >= 1
    arr = jnp.asarray(rows)
    start_id, eos_id = 1, 2
    # every line contributes [#START#] content [#EOS#]; rows are dense
    flat = [int(t) for r in rows for t in r]
    assert flat.count(start_id) == len(corpus_lines)
    assert flat.count(eos_id) == len(corpus_lines)
    assert max(flat) < len(loaded)

    # tiny LM learns on the BPE ids (same path the CLI drives)
    cfg = GPT2Config(vocab_size=len(loaded), n_positions=64, n_embd=32,
                     n_layer=2, n_head=4)
    params = init_gpt2_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rows[:4])
    l0 = float(lm_loss(params, cfg, ids))

    import optax

    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, b):
        loss, g = jax.value_and_grad(lm_loss)(p, cfg, b)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    for _ in range(10):
        params, opt, loss = step(params, opt, ids)
    assert float(loss) < l0
