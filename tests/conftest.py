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


def pytest_collection_modifyitems(config, items):
    """Run test_zero1 FIRST.

    The full suite deterministically SIGABRTs (no C++ message) inside
    test_zero1_step_matches_replicated[(4,2)] when that module runs LAST
    after hundreds of compiled programs — twice at the exact same test
    position, with jax.clear_caches() between modules making no
    difference. The module is green standalone, green in every smaller
    batch, and the minimal repro (pipeline+sharding+grad_accum+train+
    zero1) flips to 44-passed when zero1 runs first, so this is a
    cumulative jaxlib CPU-runtime host-state issue around late big
    sharded compiles, not a numerics defect. Hoisting the module is the
    working mitigation; drop this hook when jaxlib fixes it.
    """
    zero1 = [i for i in items if "test_zero1" in str(i.fspath)]
    if zero1:
        rest = [i for i in items if "test_zero1" not in str(i.fspath)]
        items[:] = zero1 + rest
