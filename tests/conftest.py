"""Test env: force an 8-device CPU mesh so pjit/shard_map paths run in CI
without TPU hardware (SURVEY.md §4 "Multi-device without a cluster")."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# The shell env pins JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# the 8-device virtual CPU mesh, and jax.config wins over the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The in-repo vocab data asset (see vocab/README.md); the reference mount
# is only a fallback so tests run on a fresh clone.
_REPO_VOCAB = os.path.join(os.path.dirname(__file__), "..", "vocab", "vocab.txt")
REFERENCE_VOCAB = (
    os.path.abspath(_REPO_VOCAB)
    if os.path.exists(_REPO_VOCAB)
    else "/root/reference/src/vocab/vocab.txt"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_vocab_path():
    if not os.path.exists(REFERENCE_VOCAB):
        pytest.skip("vocab.txt not available")
    return REFERENCE_VOCAB


@pytest.fixture(scope="session")
def tokenizer(reference_vocab_path):
    from mmtg_tpu.tokenizer import WordPieceTokenizer

    return WordPieceTokenizer.from_file(reference_vocab_path)


@pytest.fixture(scope="session")
def tiny_model_cfg():
    """Small-but-structured config: full wiring, fast to run."""
    from mmtg_tpu.configs import ChannelConfig, GPT2Config, ModelConfig

    return ModelConfig(
        seq_len=5,
        topic=ChannelConfig(input_dim=64, hidden_dim=32, type="MLP"),
        image=ChannelConfig(input_dim=64, hidden_dim=32, type="GRU"),
        text=ChannelConfig(input_dim=64, hidden_dim=32, type="GRU"),
        self_att_hidden_size=32,
        self_att_heads=4,
        mm_att_out_dim=64,
        gpt2=GPT2Config(
            vocab_size=200, n_positions=256, n_ctx=250, n_embd=48, n_layer=2, n_head=4
        ),
    )


@pytest.fixture(scope="session")
def tiny_data_cfg():
    from mmtg_tpu.configs import DataConfig

    return DataConfig(wenlan_emb_size=64)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module.

    The full suite compiles hundreds of programs (many on the 8-device
    virtual mesh); without this, the accumulated executables' host
    resources eventually SIGABRT the process near the END of the suite
    (observed twice at the same spot — test_zero1, alphabetically last —
    while the same module is green standalone and in any smaller batch).
    Per-module cache clearing bounds the accumulation; modules re-compile
    their own programs anyway, so the wall-clock cost is negligible.
    """
    yield
    jax.clear_caches()


# tests/isolated/ holds modules whose big sharded compiles deterministically
# SIGABRT the jaxlib CPU runtime when they run LATE in a long pytest process
# (r03 bisect: test_zero1's (4,2)-mesh compile after hundreds of compiled
# programs aborts; the same module is green standalone and in any smaller
# batch — a cumulative host-state issue, not numerics). They run in a FRESH
# subprocess via tests/test_isolated_modules.py, which is ordering-immune —
# the r03 mitigation (a pytest_collection_modifyitems hoist) is gone.
# MMTG_RUN_ISOLATED=1 marks that child process; only then are they collected
# in-process.
collect_ignore = [] if os.environ.get("MMTG_RUN_ISOLATED") else ["isolated"]
