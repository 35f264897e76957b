"""Serving layer: window batching, per-request PRNG invariance, HTTP front.

The property under test is the serving contract (serve.py module
docstring): a request's tokens depend only on (service base seed, request
seed) — never on which other requests shared its batch or how the batch
was padded — which is what lets the batcher group concurrent traffic
freely. The reference has no batched serving at all (``predict.py:76``
"batch size 1 for now").
"""

import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from mmtg_tpu.configs import GenerateConfig
from mmtg_tpu.decoding import generate
from mmtg_tpu.models.mmtg import init_mmtg_params
from mmtg_tpu.serve import GenerationService, serve_http

import jax.numpy as jnp


@pytest.fixture(scope="module")
def serve_setup(request):
    mcfg = request.getfixturevalue("tiny_model_cfg")
    dcfg = request.getfixturevalue("tiny_data_cfg")
    tokenizer = request.getfixturevalue("tokenizer")
    rng = np.random.default_rng(13)
    from mmtg_tpu.data import MMTGDataset, make_synthetic_records

    records = make_synthetic_records(4, rng, emb_size=dcfg.wenlan_emb_size)
    ds = MMTGDataset.from_records(records, tokenizer, dcfg, if_train=False)
    V = mcfg.gpt2.vocab_size
    samples = []
    for i in range(len(ds)):
        row = {k: np.asarray(v) for k, v in ds[i].items()}
        row["topic_ids"] = np.minimum(row["topic_ids"], V - 1)
        samples.append(row)
    params = init_mmtg_params(jax.random.PRNGKey(3), mcfg)
    table = jax.random.normal(jax.random.PRNGKey(4), (V, dcfg.wenlan_emb_size))
    const = {"wenlan_table": table}
    gcfg = GenerateConfig(length=46, top_k=8, top_p=0.7, temperature=1.1,
                          repetition_penalty=1.5)
    return params, const, mcfg, dcfg, gcfg, samples


def _direct(params, const, mcfg, dcfg, gcfg, samples, seeds, base_seed=0):
    from mmtg_tpu.serve import SAMPLE_KEYS

    batch = {
        k: jnp.asarray(np.stack([s[k] for s in samples]))
        for k in SAMPLE_KEYS
    }
    return np.asarray(
        generate(params, const, mcfg, dcfg, gcfg, batch,
                 jax.random.PRNGKey(base_seed),
                 row_seeds=jnp.asarray(seeds, jnp.int32))
    )


def test_row_seeds_batch_composition_invariance(serve_setup):
    """Engine-level: a (sample, seed) row decodes identically alone, in a
    different batch order, and next to different neighbors."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    a, b, c = samples[0], samples[1], samples[2]
    ab = _direct(params, const, mcfg, dcfg, gcfg, [a, b], [7, 8])
    cba = _direct(params, const, mcfg, dcfg, gcfg, [c, b, a], [9, 8, 7])
    solo = _direct(params, const, mcfg, dcfg, gcfg, [a], [7])
    np.testing.assert_array_equal(ab[0], cba[2])
    np.testing.assert_array_equal(ab[1], cba[1])
    np.testing.assert_array_equal(ab[0], solo[0])


def test_row_seeds_distinct_streams(serve_setup):
    """Same sample, different seeds → different sampled tokens (and the
    frame grid still holds on every row)."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    out = _direct(params, const, mcfg, dcfg, gcfg,
                  [samples[0]] * 3, [1, 2, 1])
    np.testing.assert_array_equal(out[0], out[2])
    assert (out[0] != out[1]).any()
    from mmtg_tpu.configs import SpecialTokens

    sp = SpecialTokens()
    for k in range(out.shape[1] // 22):
        assert (out[:, 22 * k] == sp.start_id).all()


def test_service_batches_and_matches_direct(serve_setup):
    """Concurrent submits get merged into one padded bucket and each
    response equals the direct engine run for its (sample, seed)."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(4,), max_wait_ms=2000.0, base_seed=0)
    with svc:
        futs = [svc.submit(samples[i], seed=100 + i) for i in range(3)]
        got = [f.result(timeout=600) for f in futs]
    direct = _direct(params, const, mcfg, dcfg, gcfg,
                     samples[:3], [100, 101, 102])
    for i in range(3):
        np.testing.assert_array_equal(got[i], direct[i])
    st = svc.stats()
    assert st["requests"] == 3
    assert st["batches"] == 1  # one window, padded 3 -> 4
    assert st["padded_rows"] == 1
    assert st["p50_latency_ms"] > 0


def test_service_solo_equals_batched(serve_setup):
    """The serving contract end-to-end: the same request returns identical
    tokens whether it was served alone or batched with others."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2, 4), max_wait_ms=1500.0, base_seed=0)
    with svc:
        batched = [svc.submit(samples[i], seed=5) for i in range(3)]
        batched = [f.result(timeout=600) for f in batched]
    svc2 = GenerationService(params, const, mcfg, dcfg, gcfg,
                             buckets=(2, 4), max_wait_ms=0.0, base_seed=0)
    with svc2:
        solo = svc2.generate_sync(samples[0], seed=5)
    np.testing.assert_array_equal(batched[0], solo)


@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2)])
def test_mesh_service_matches_single_device(serve_setup, mesh_shape):
    """Serving over a DP / DP×TP mesh returns token-identical responses to
    single-device serving — scaling out never changes a reply (per-row
    streams skip the data-axis rng fold)."""
    from mmtg_tpu.parallel.mesh import make_mesh

    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    single = GenerationService(params, const, mcfg, dcfg, gcfg,
                               buckets=(4,), max_wait_ms=1500.0, base_seed=0)
    with single:
        futs = [single.submit(samples[i], seed=50 + i) for i in range(3)]
        want = [f.result(timeout=600) for f in futs]
    mesh = make_mesh(mesh_shape)
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(4,), max_wait_ms=1500.0, base_seed=0,
                            mesh=mesh)
    with svc:
        futs = [svc.submit(samples[i], seed=50 + i) for i in range(3)]
        got = [f.result(timeout=600) for f in futs]
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_mesh_service_rejects_indivisible_buckets(serve_setup):
    from mmtg_tpu.parallel.mesh import make_mesh

    params, const, mcfg, dcfg, gcfg, _ = serve_setup
    with pytest.raises(ValueError, match="not divisible"):
        GenerationService(params, const, mcfg, dcfg, gcfg,
                          buckets=(2, 4), mesh=make_mesh((4, 1)))


def test_service_validates_samples(serve_setup):
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg, buckets=(2,))
    bad = dict(samples[0])
    bad.pop("topic_emb")
    with pytest.raises(ValueError, match="missing keys"):
        svc._validate(bad)
    bad2 = dict(samples[0])
    bad2["topic_ids"] = bad2["topic_ids"][:-1]
    with pytest.raises(ValueError, match="topic_ids shape"):
        svc._validate(bad2)
    # a wrong-T img_embs must be rejected at the EDGE: inside a window it
    # would poison batch-mates (np.stack) or trace a fresh multi-minute
    # compile (internally-consistent wrong length)
    bad3 = dict(samples[0])
    bad3["img_embs"] = np.asarray(bad3["img_embs"])[:-1]
    with pytest.raises(ValueError, match="img_embs shape"):
        svc._validate(bad3)


def test_seed_out_of_int32_is_masked_not_fatal(serve_setup):
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=0.0, base_seed=0)
    with svc:
        big = svc.generate_sync(samples[0], seed=2**40)  # & 0xFFFFFFFF == 0
        zero = svc.generate_sync(samples[0], seed=0)
    np.testing.assert_array_equal(big, zero)


def test_cancelled_request_is_skipped(serve_setup):
    """A request cancelled while queued never decodes; batch-mates are
    unaffected (and still match the direct run of just themselves)."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2, 4), max_wait_ms=1500.0, base_seed=0)
    with svc:
        f_keep = svc.submit(samples[0], seed=40)
        f_cancel = svc.submit(samples[1], seed=41)
        assert f_cancel.cancel()
        kept = f_keep.result(timeout=600)
    import concurrent.futures

    with pytest.raises(concurrent.futures.CancelledError):
        f_cancel.result(timeout=1)
    direct = _direct(params, const, mcfg, dcfg, gcfg, [samples[0]], [40])
    np.testing.assert_array_equal(kept, direct[0])
    assert svc.stats()["cancelled"] == 1


def test_stop_serves_already_submitted_requests(serve_setup):
    """stop() is a graceful drain: everything submitted before it still
    resolves (the sentinel sits behind the queued work)."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(4,), max_wait_ms=500.0, base_seed=0)
    svc.start()
    futs = [svc.submit(samples[i], seed=60 + i) for i in range(3)]
    svc.stop()  # joins both threads
    got = [f.result(timeout=1) for f in futs]
    direct = _direct(params, const, mcfg, dcfg, gcfg,
                     samples[:3], [60, 61, 62])
    for i in range(3):
        np.testing.assert_array_equal(got[i], direct[i])
    st = svc.stats()
    assert st["tokens_served"] == 3 * gcfg.length
    assert st["tokens_per_s"] > 0


def test_overload_sheds_at_the_edge(serve_setup):
    from mmtg_tpu.serve import ServiceOverloaded

    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg, buckets=(2,),
                            max_wait_ms=0.0, base_seed=0, max_queue_depth=0)
    with svc:
        with pytest.raises(ServiceOverloaded, match="max_queue_depth"):
            svc.submit(samples[0], seed=1)
    assert svc.stats()["rejected"] == 1


def test_swap_params_hot_reload(serve_setup):
    """Weight hot-swap: same compiled programs, new outputs, next window;
    mismatched trees are rejected."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=0.0, base_seed=0)
    with svc:
        before = svc.generate_sync(samples[0], seed=3)
        other = init_mmtg_params(jax.random.PRNGKey(99), mcfg)
        svc.swap_params(other)
        after = svc.generate_sync(samples[0], seed=3)
        again = svc.generate_sync(samples[0], seed=3)
    assert (np.asarray(before) != np.asarray(after)).any()
    np.testing.assert_array_equal(after, again)  # still deterministic
    bad = {k: v for k, v in params.items() if k != "projector1"}
    with pytest.raises(ValueError, match="do not match"):
        svc.swap_params(bad)


def test_hot_swap_under_traffic(serve_setup):
    """swap_params is an atomic rebind: under concurrent reloads, every
    response is a coherent decode of ONE weight set (never a torn mix),
    proven by matching each reply against the two valid decodes."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    other = init_mmtg_params(jax.random.PRNGKey(99), mcfg)
    want_a = _direct(params, const, mcfg, dcfg, gcfg, [samples[0]], [5])[0]
    wb = _direct(other, const, mcfg, dcfg, gcfg, [samples[0]], [5])[0]
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=0.0, base_seed=0)
    import threading as th

    stop = th.Event()

    def swapper():
        flip = False
        while not stop.is_set():
            svc.swap_params(other if flip else params)
            flip = not flip
            # each swap copies the full tree; unthrottled it starves the
            # decode windows for the GIL and just slows the suite
            time.sleep(0.001)

    with svc:
        t = th.Thread(target=swapper, daemon=True)
        t.start()
        try:
            for _ in range(8):
                got = np.asarray(svc.generate_sync(samples[0], seed=5))
                assert (got == np.asarray(want_a)).all() or \
                       (got == np.asarray(wb)).all(), "torn weight swap"
        finally:
            stop.set()
            t.join()


def test_decode_fault_fails_window_cleanly(serve_setup):
    """Fault injection (docs/OPERATIONS.md drill): a decode fault takes
    down ONE window — its requests get the exception promptly (no hang),
    the error is counted, and the batcher survives to serve the next
    window bit-identically to a healthy engine."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=0.0, base_seed=0)
    real_decode = svc._decode

    def faulty(batch, seeds):
        raise RuntimeError("injected decode fault (drill)")

    with svc:
        want = np.asarray(svc.generate_sync(samples[0], seed=11))
        svc._decode = faulty
        fut = svc.submit(samples[0], seed=12)
        with pytest.raises(RuntimeError, match="injected decode fault"):
            fut.result(timeout=60)
        svc._decode = real_decode
        got = np.asarray(svc.generate_sync(samples[0], seed=11))
    np.testing.assert_array_equal(got, want)
    assert svc.stats()["errors"] >= 1


def test_engine_death_drains_and_restart_serves(serve_setup):
    """Hard engine death mid-traffic (an error that ESCAPES the dispatch
    loop's defensive catches): queued requests fail cleanly instead of
    hanging, later submits are rejected with the cause, stop() still
    joins (the collector gets its sentinel from the crash path), and a
    restarted engine serves the same request deterministically."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(1,), max_wait_ms=0.0, base_seed=0)

    class EngineDeath(BaseException):
        # BaseException: models a poisoned runtime the Exception-level
        # catches in _dispatch_loop deliberately do not swallow
        pass

    def dying(batch, seeds):
        raise EngineDeath("injected engine death (drill)")

    svc._decode = dying
    svc.start()
    # burst of submits: the first window dies the batcher; every other
    # request must fail CLEANLY — rejected at the edge (submit raises)
    # or via the crash path's queue drain (future gets the error) — and
    # none may hang
    failures = 0
    for i in range(4):
        try:
            fut = svc.submit(samples[i % len(samples)], seed=20 + i)
        except RuntimeError:
            failures += 1
            continue
        with pytest.raises((RuntimeError, EngineDeath)):
            fut.result(timeout=60)
        failures += 1
    assert failures == 4
    # engine is down: submit fails fast with the cause, not a void queue
    import time as _time
    deadline = _time.monotonic() + 30
    while svc._thread.is_alive() and _time.monotonic() < deadline:
        _time.sleep(0.01)
    with pytest.raises(RuntimeError, match="engine is down"):
        svc.submit(samples[0], seed=30)
    svc.stop()  # must not deadlock on the collector join

    # restart drill: a fresh engine over the same weights serves, and the
    # per-request PRNG contract makes the response identical to a healthy
    # service that never crashed
    healthy = GenerationService(params, const, mcfg, dcfg, gcfg,
                                buckets=(1,), max_wait_ms=0.0, base_seed=0)
    with healthy:
        want = np.asarray(healthy.generate_sync(samples[0], seed=31))
    restarted = GenerationService(params, const, mcfg, dcfg, gcfg,
                                  buckets=(1,), max_wait_ms=0.0, base_seed=0)
    with restarted:
        got = np.asarray(restarted.generate_sync(samples[0], seed=31))
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def cli_artifacts(tmp_path_factory, request):
    """Tiny CLI-loadable artifacts shared by the CLI-wiring tests: a
    trained checkpoint (via the real train CLI), an emb-table pkl, and
    the records that produced them."""
    import dataclasses
    import pickle

    from mmtg_tpu.configs import GPT2Config
    from mmtg_tpu.data import make_synthetic_records
    from mmtg_tpu.train import main as train_main

    tiny_model_cfg = request.getfixturevalue("tiny_model_cfg")
    tiny_data_cfg = request.getfixturevalue("tiny_data_cfg")
    reference_vocab_path = request.getfixturevalue("reference_vocab_path")
    rng = np.random.default_rng(21)
    tmp_path = tmp_path_factory.mktemp("serve_cli")

    records = make_synthetic_records(8, rng,
                                     emb_size=tiny_data_cfg.wenlan_emb_size)
    train_pkl = tmp_path / "train.pkl"
    with open(train_pkl, "wb") as f:
        pickle.dump(records, f)
    emb_pkl = tmp_path / "emb.pkl"
    table = {i: rng.standard_normal(
        tiny_data_cfg.wenlan_emb_size).astype("float32")
        for i in range(13317)}
    with open(emb_pkl, "wb") as f:
        pickle.dump(table, f)
    mcfg = dataclasses.replace(
        tiny_model_cfg,
        gpt2=GPT2Config(vocab_size=13317, n_positions=256, n_embd=48,
                        n_layer=2, n_head=4),
    )
    save = tmp_path / "ckpt"
    train_main(
        ["--batch_size", "4", "--val_batch_size", "4", "--epochs", "1",
         "--lr", "1e-3", "--curriculums", "[0,0]", "--log_interval", "8",
         "--train_data_path", str(train_pkl),
         "--val_data_path", str(train_pkl),
         "--vocab_path", reference_vocab_path,
         "--token_emb_path", str(emb_pkl),
         "--save_model", "--save_path", str(save),
         "--dtype", "float32", "--mesh_data", "1", "--mesh_model", "1"],
        mcfg=mcfg, dcfg=tiny_data_cfg,
    )
    return {
        "ckpt": str(save),
        "emb_pkl": str(emb_pkl),
        "vocab": reference_vocab_path,
        "records": records,
        "mcfg": mcfg,
        "dcfg": tiny_data_cfg,
    }


def test_stream_matches_batched(serve_setup):
    """The streaming lane is bit-identical to the batched path: the
    per-row PRNG stream depends only on (base_seed, request seed, step),
    so [START] + concat(stream blocks) == submit()'s tokens — a client
    can stream interactively and re-fetch the same lyric batched."""
    from mmtg_tpu.configs import SpecialTokens

    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=0.0, base_seed=0)
    with svc:
        blocks = list(svc.stream(samples[1], seed=9))
        batched = np.asarray(svc.generate_sync(samples[1], 9))
    streamed = np.concatenate(
        [[SpecialTokens().start_id], np.concatenate(blocks)]
    )
    np.testing.assert_array_equal(streamed, batched)
    assert len(blocks) > 1  # it actually streamed in chunks
    st = svc.stats()
    assert st["streams"] == 1 and st["stream_tokens"] == gcfg.length


def test_stream_shares_window_with_batched(serve_setup):
    """Streams are first-class window rows: concurrent streams and
    one-shot submits pack into ONE batched window (batches == 1), every
    participant gets its exact direct-engine tokens, and the streams
    deliver real multi-block progress — no dedicated batch-1 lanes."""
    from mmtg_tpu.configs import SpecialTokens

    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(4,), max_wait_ms=3000.0, base_seed=0)
    start_id = SpecialTokens().start_id
    stream_out = {}

    def consume(idx, seed):
        stream_out[idx] = list(svc.stream(samples[idx], seed))

    with svc:
        threads = [threading.Thread(target=consume, args=(i, 20 + i))
                   for i in (0, 1)]
        for t in threads:
            t.start()
        time.sleep(0.1)  # let the streams enqueue into the open window
        fut = svc.submit(samples[2], seed=22)
        batched = np.asarray(fut.result(timeout=600))
        for t in threads:
            t.join(timeout=600)
    direct = _direct(params, const, mcfg, dcfg, gcfg,
                     samples[:3], [20, 21, 22])
    np.testing.assert_array_equal(batched, direct[2])
    for i in (0, 1):
        assert len(stream_out[i]) > 1  # actually streamed in blocks
        streamed = np.concatenate([[start_id], np.concatenate(stream_out[i])])
        np.testing.assert_array_equal(streamed, direct[i])
    st = svc.stats()
    assert st["batches"] == 1  # streams and the submit shared one window
    assert st["streams"] == 2
    assert st["stream_tokens"] == 2 * gcfg.length
    assert st["served"] == 3


def test_stream_overload_sheds_at_queue_edge(serve_setup):
    """Streams shed at the SAME queue edge as one-shot requests
    (ServiceOverloaded from the first next()); an unconsumed generator
    never enqueues; bad shapes are rejected eagerly."""
    from mmtg_tpu.serve import ServiceOverloaded

    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg, buckets=(2,),
                            max_wait_ms=0.0, base_seed=0, max_queue_depth=0)
    with svc:
        it = svc.stream(samples[0], 1)
        assert svc.stats()["requests"] == 0  # lazy: nothing enqueued yet
        with pytest.raises(ServiceOverloaded, match="max_queue_depth"):
            next(it)
        # bad shapes are rejected EAGERLY, before anything is enqueued
        with pytest.raises(ValueError, match="shape"):
            svc.stream({**samples[0], "topic_emb": np.zeros(3)}, 0)
    assert svc.stats()["rejected"] == 1


def test_stream_hangup_window_completes(serve_setup):
    """A client hang-up (generator close) never disturbs the shared
    window: batch-mates finish, the service keeps serving, and
    stream_tokens counts the tokens decoded-and-handed-off for the
    stream row (its window keeps decoding for the others)."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=200.0)
    with svc:
        it = svc.stream(samples[0], 1)
        fut = svc.submit(samples[1], seed=2)
        first = next(it)
        it.close()  # hang up after one sentence
        mate = np.asarray(fut.result(timeout=600))  # batch-mate unharmed
        direct = _direct(params, const, mcfg, dcfg, gcfg, [samples[1]], [2])
        np.testing.assert_array_equal(mate, direct[0])
        assert first.size == dcfg.sent_frame_length
        # the window completed → all its stream-row tokens were decoded
        # and handed off (the consumer just never read past block 1)
        deadline = time.monotonic() + 60
        while (svc.stats()["stream_tokens"] < gcfg.length
               and time.monotonic() < deadline):
            time.sleep(0.01)
        assert svc.stats()["stream_tokens"] == gcfg.length
        # service healthy after the hang-up
        np.testing.assert_array_equal(
            np.asarray(svc.generate_sync(samples[1], 2)), direct[0]
        )


@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2)])
def test_stream_on_mesh_matches_single_device(serve_setup, mesh_shape):
    """Streaming is a first-class mode on MESHED services: a streamed
    request on a DP / DP×TP mesh delivers block-by-block and its
    concatenation equals the single-device direct decode token for token
    (the decode state stays on-mesh between chunks)."""
    from mmtg_tpu.configs import SpecialTokens
    from mmtg_tpu.parallel.mesh import make_mesh

    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg, buckets=(4,),
                            max_wait_ms=0.0, base_seed=0,
                            mesh=make_mesh(mesh_shape))
    with svc:
        blocks = list(svc.stream(samples[0], seed=31))
    assert len(blocks) > 1
    streamed = np.concatenate(
        [[SpecialTokens().start_id], np.concatenate(blocks)]
    )
    direct = _direct(params, const, mcfg, dcfg, gcfg, [samples[0]], [31])
    np.testing.assert_array_equal(streamed, direct[0])


def test_http_stream_endpoint(serve_setup, tokenizer):
    """POST /generate_stream: SSE events, one per decoded block, then a
    terminal done event; concatenated tokens equal /generate's for the
    same (sample, seed)."""
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=0.0, base_seed=0)
    with svc:
        httpd = serve_http(svc, port=0, tokenizer=tokenizer)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            body = json.dumps({
                "sample": {k: np.asarray(v).tolist()
                           for k, v in samples[0].items()},
                "seed": 5,
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate_stream", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                assert r.headers["Content-Type"] == "text/event-stream"
                raw = r.read().decode("utf-8")
            events = [json.loads(ev[len("data: "):])
                      for ev in raw.split("\n\n") if ev.startswith("data: ")]
            assert events[-1].get("done") is True
            assert events[-1]["tokens_total"] == gcfg.length
            toks = [t_ for ev in events[:-1] for t_ in ev["tokens"]]
            assert all(isinstance(ev.get("text"), str) for ev in events[:-1])
            direct = _direct(params, const, mcfg, dcfg, gcfg,
                             [samples[0]], [5])
            np.testing.assert_array_equal(
                np.asarray([int(direct[0][0])] + toks), direct[0]
            )
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_serve_cli_build_service(cli_artifacts):
    """The CLI wiring end-to-end with a tiny injected model: train a
    checkpoint, build the service through parsed args (tokenizer, ckpt
    load, table load, bucket parsing), serve one HTTP request."""
    from mmtg_tpu.serve import build_arg_parser, build_service

    a = cli_artifacts
    mcfg, tiny_data_cfg, records = a["mcfg"], a["dcfg"], a["records"]
    reference_vocab_path = a["vocab"]

    args = build_arg_parser().parse_args(
        ["--model_path", a["ckpt"],
         "--tokenizer_path", reference_vocab_path,
         "--token_emb_path", a["emb_pkl"],
         "--buckets", "2,4", "--max_wait_ms", "0"]
    )
    service, tok = build_service(args, mcfg=mcfg, dcfg=tiny_data_cfg)
    try:
        httpd = serve_http(service, port=0, tokenizer=tok)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            from mmtg_tpu.data import MMTGDataset
            from mmtg_tpu.tokenizer import WordPieceTokenizer

            wp = WordPieceTokenizer.from_file(reference_vocab_path)
            ds = MMTGDataset.from_records(records, wp, tiny_data_cfg,
                                          if_train=False)
            row = {k: np.asarray(v).tolist() for k, v in ds[0].items()}
            body = json.dumps({"sample": row, "seed": 1}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{httpd.server_address[1]}/generate",
                data=body, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                out = json.loads(r.read())
            assert len(out["tokens"]) == tiny_data_cfg.max_seq_length + 1
            assert isinstance(out.get("text", ""), str)
        finally:
            httpd.shutdown()
    finally:
        service.stop()


def test_service_resolves_auto_weight_dtype_once(serve_setup):
    """weight_dtype='auto' resolves ONCE per service from the LARGEST
    bucket — never per window/bucket, which would decode the same
    (request, seed) differently by batch composition."""
    import dataclasses

    params, const, mcfg, dcfg, gcfg, _ = serve_setup
    auto = dataclasses.replace(gcfg, weight_dtype="auto")
    small = GenerationService(params, const, mcfg, dcfg, auto,
                              buckets=(2, 8), max_wait_ms=0.0)
    assert small.gcfg.weight_dtype == "int8"
    big = GenerationService(params, const, mcfg, dcfg, auto,
                            buckets=(2, 8, 48), max_wait_ms=0.0)
    assert big.gcfg.weight_dtype == "model"
    pinned = GenerationService(params, const, mcfg, dcfg,
                               dataclasses.replace(gcfg, weight_dtype="model"),
                               buckets=(2,), max_wait_ms=0.0)
    assert pinned.gcfg.weight_dtype == "model"


def test_service_resolves_auto_cache_dtype_once(serve_setup):
    """cache_dtype='auto' pins from the LARGEST bucket, like weights —
    even a bucket-1 window must use the shared int8 cache or the same
    (request, seed) would decode differently by batch composition."""
    import dataclasses

    params, const, mcfg, dcfg, gcfg, _ = serve_setup
    auto = dataclasses.replace(gcfg, cache_dtype="auto")
    svc = GenerationService(params, const, mcfg, dcfg, auto,
                            buckets=(1, 8), max_wait_ms=0.0)
    assert svc.gcfg.cache_dtype == "int8"
    solo = GenerationService(params, const, mcfg, dcfg, auto,
                             buckets=(1,), max_wait_ms=0.0)
    assert solo.gcfg.cache_dtype == "model"
    pinned = GenerationService(params, const, mcfg, dcfg,
                               dataclasses.replace(gcfg, cache_dtype="int8"),
                               buckets=(1,), max_wait_ms=0.0)
    assert pinned.gcfg.cache_dtype == "int8"
    # meshed services resolve fp regardless of bucket (mesh-shape
    # invariance — resolve_cache_dtype docstring)
    from mmtg_tpu.parallel.mesh import make_mesh

    meshed = GenerationService(params, const, mcfg, dcfg, auto,
                               buckets=(8,), mesh=make_mesh((4, 1)))
    assert meshed.gcfg.cache_dtype == "model"


def test_serve_cli_mesh_flags(cli_artifacts):
    """--mesh_data/--mesh_model (inherited from the generate parser) wire
    a (data, model) mesh into the service; a served request matches the
    single-device service bit-exactly (row-seed mesh invariance)."""
    from mmtg_tpu.serve import build_arg_parser, build_service

    a = cli_artifacts
    base = ["--model_path", a["ckpt"],
            "--tokenizer_path", a["vocab"],
            "--token_emb_path", a["emb_pkl"],
            "--buckets", "2,4", "--max_wait_ms", "0"]
    from mmtg_tpu.data import MMTGDataset
    from mmtg_tpu.tokenizer import WordPieceTokenizer

    wp = WordPieceTokenizer.from_file(a["vocab"])
    ds = MMTGDataset.from_records(a["records"], wp, a["dcfg"],
                                  if_train=False)
    sample = {k: np.asarray(v) for k, v in ds[0].items()}

    outs = []
    for extra in ([], ["--mesh_data", "2", "--mesh_model", "2"]):
        args = build_arg_parser().parse_args(base + extra)
        service, _tok = build_service(args, mcfg=a["mcfg"], dcfg=a["dcfg"])
        try:
            assert (service.mesh is None) == (not extra)
            outs.append(np.asarray(service.generate_sync(sample, seed=5)))
        finally:
            service.stop()
    np.testing.assert_array_equal(outs[0], outs[1])


def test_sigterm_graceful_drain(cli_artifacts):
    """`main()` under SIGTERM (what systemd/k8s send on stop) behaves like
    Ctrl-C: serve_forever unwinds, queued work is served, main returns.
    Runs the real CLI entry in the pytest main thread (signal handlers
    require it) with a helper thread playing the client + init system."""
    import os
    import signal
    import socket

    from mmtg_tpu.serve import main as serve_main

    a = cli_artifacts
    # pre-pick a free port: main(port=0) would bind fine but the helper
    # thread has no way to learn the ephemeral port it got
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    result: dict = {}

    def client_and_terminate():
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                ) as r:
                    if json.loads(r.read()) == {"ok": True}:
                        break
            except OSError:
                time.sleep(0.2)
        else:  # pragma: no cover - diagnostics on hang
            result["error"] = "server never became healthy"
            os.kill(os.getpid(), signal.SIGTERM)
            return
        from mmtg_tpu.data import MMTGDataset
        from mmtg_tpu.tokenizer import WordPieceTokenizer

        wp = WordPieceTokenizer.from_file(a["vocab"])
        ds = MMTGDataset.from_records(a["records"], wp, a["dcfg"],
                                      if_train=False)
        row = {k: np.asarray(v).tolist() for k, v in ds[0].items()}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"sample": row, "seed": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            result["tokens"] = json.loads(r.read())["tokens"]
        os.kill(os.getpid(), signal.SIGTERM)

    prev = signal.getsignal(signal.SIGTERM)
    helper = threading.Thread(target=client_and_terminate)
    helper.start()
    try:
        serve_main(
            ["--model_path", a["ckpt"],
             "--tokenizer_path", a["vocab"],
             "--token_emb_path", a["emb_pkl"],
             "--buckets", "2", "--max_wait_ms", "0",
             "--host", "127.0.0.1", "--port", str(port)],
            mcfg=a["mcfg"], dcfg=a["dcfg"],
        )  # returning at all IS the assertion that SIGTERM drains cleanly
    finally:
        helper.join(timeout=60)
        signal.signal(signal.SIGTERM, prev)
    assert "error" not in result, result
    assert len(result["tokens"]) == a["dcfg"].max_seq_length + 1
    assert not helper.is_alive()


def test_http_front(serve_setup, tokenizer):
    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=0.0, base_seed=0)
    with svc:
        httpd = serve_http(svc, port=0, tokenizer=tokenizer)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                assert json.loads(r.read()) == {"ok": True}

            body = json.dumps({
                "sample": {k: np.asarray(v).tolist()
                           for k, v in samples[0].items()},
                "seed": 5,
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                out = json.loads(r.read())
            direct = _direct(params, const, mcfg, dcfg, gcfg,
                             [samples[0]], [5])
            np.testing.assert_array_equal(np.asarray(out["tokens"]), direct[0])
            assert "text" in out and isinstance(out["text"], str)

            # binary npz body: same (sample, seed) -> byte-identical tokens,
            # and the payload is a fraction of the JSON size
            from mmtg_tpu.serve import NPZ_CONTENT_TYPE, encode_request_npz

            nbody = encode_request_npz(samples[0], seed=5)
            assert len(nbody) < len(body)
            nreq = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=nbody,
                headers={"Content-Type": NPZ_CONTENT_TYPE},
            )
            with urllib.request.urlopen(nreq, timeout=600) as r:
                nout = json.loads(r.read())
            assert nout["tokens"] == out["tokens"]

            # npz auto-detection by zip magic (generic content type)
            nreq2 = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=nbody,
                headers={"Content-Type": "application/octet-stream"},
            )
            with urllib.request.urlopen(nreq2, timeout=600) as r:
                assert json.loads(r.read())["tokens"] == out["tokens"]

            # truncated npz -> 400, not a dropped socket / 500
            corrupt = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=nbody[:100],
                headers={"Content-Type": NPZ_CONTENT_TYPE},
            )
            try:
                urllib.request.urlopen(corrupt, timeout=30)
                code = 200
            except urllib.error.HTTPError as e:
                code = e.code
            assert code == 400

            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"sample": {}}).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(bad, timeout=30)
                raised = False
            except urllib.error.HTTPError as e:
                raised = e.code == 400
            assert raised

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30
            ) as r:
                st = json.loads(r.read())
            assert st["requests"] >= 1 and st["batches"] >= 1

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30
            ) as r:
                assert r.headers["Content-Type"].startswith("text/plain")
                text = r.read().decode()
            assert f'mmtg_requests_total {st["requests"]}' in text
            assert "# TYPE mmtg_requests_total counter" in text
        finally:
            httpd.shutdown()


def test_npz_request_codec_roundtrip():
    """Pure codec: arrays round-trip bit-exactly, meta defaults match the
    JSON path (seed 0 / timeout 600 / text True), pickles are refused."""
    from mmtg_tpu.serve import decode_request_npz, encode_request_npz

    rng = np.random.default_rng(0)
    sample = {
        "topic_ids": rng.integers(0, 100, 15).astype(np.int32),
        "tpw_attention_mask": np.ones(15, np.int32),
        "tpw_type_ids": np.zeros(15, np.int32),
        "topic_emb": rng.standard_normal(32).astype(np.float32),
        "img_embs": rng.standard_normal((5, 32)).astype(np.float32),
        "r_embs": rng.standard_normal((5, 32)).astype(np.float32),
    }
    got, meta = decode_request_npz(encode_request_npz(sample))
    assert meta == {"seed": 0, "timeout": 600.0, "text": True}
    assert set(got) == set(sample)
    for k in sample:
        np.testing.assert_array_equal(got[k], sample[k])
        assert got[k].dtype == sample[k].dtype

    _, meta = decode_request_npz(
        encode_request_npz(sample, seed=42, timeout=5.0, text=False))
    assert meta == {"seed": 42, "timeout": 5.0, "text": False}

    # an object-array payload must not deserialize (allow_pickle=False)
    import io

    buf = io.BytesIO()
    # savez itself pickles object arrays by default; the *decoder* must
    # refuse to unpickle them
    np.savez(buf, evil=np.asarray({"a": 1}, dtype=object))
    with pytest.raises(ValueError):
        decode_request_npz(buf.getvalue())


def test_prometheus_metrics_renders_stats():
    from mmtg_tpu.serve import prometheus_metrics

    stats = {
        "requests": 7, "batches": 3, "padded_rows": 2, "served": 6,
        "tokens_served": 1200, "rejected": 1, "cancelled": 0, "errors": 0,
        "mean_fill": 0.75, "mean_batch": 2.0, "uptime_s": 10.0,
        "tokens_per_s": 120.0, "p50_latency_ms": 500.0,
        "p95_latency_ms": 900.0,
    }
    text = prometheus_metrics(stats)
    assert text.endswith("\n")
    assert "mmtg_requests_total 7" in text
    assert "mmtg_tokens_served_total 1200" in text
    assert "# TYPE mmtg_window_fill_ratio gauge" in text
    assert "mmtg_window_fill_ratio 0.75" in text
    # latency summary is in seconds
    assert 'mmtg_request_latency_seconds{quantile="0.5"} 0.5' in text
    assert 'mmtg_request_latency_seconds{quantile="0.95"} 0.9' in text
    # no percentile keys -> no summary block, still valid exposition text
    text2 = prometheus_metrics({"requests": 0})
    assert "latency" not in text2 and "mmtg_requests_total 0" in text2
    # every non-comment line is "name[{labels}] value"
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        name, val = line.rsplit(" ", 1)
        float(val)
        assert name.startswith("mmtg_")


def test_stall_detection_and_wedged_stop(serve_setup):
    """r05 75-min soak finding: a decode call that never returns (device/
    tunnel stall) is a HANG, not a crash — no exception fires. The
    service must (a) report growing ``stalled_s`` while work is pending,
    (b) refuse to hang forever in stop() (join timeout → engine_error),
    and (c) report stalled_s == 0 when healthy/idle."""
    import threading as _t

    params, const, mcfg, dcfg, gcfg, samples = serve_setup
    svc = GenerationService(params, const, mcfg, dcfg, gcfg,
                            buckets=(2,), max_wait_ms=5.0, base_seed=0,
                            stall_unhealthy_s=0.2)
    release = _t.Event()

    class _Hang:
        """Stands in for the in-flight device value; collector's
        np.asarray() blocks like a wedged device→host transfer."""
        def __array__(self, dtype=None, copy=None):
            release.wait(60.0)
            raise RuntimeError("wedge released")

    orig = svc._decode
    svc._decode = lambda batch, seeds: _Hang()
    try:
        with svc:
            fut = svc.submit(samples[0], seed=1)
            deadline = time.time() + 30
            while time.time() < deadline:
                st = svc.stats()
                if st["stalled_s"] > 0.2 and st["pending"] >= 1:
                    break
                time.sleep(0.05)
            else:
                raise AssertionError(f"never stalled: {svc.stats()}")
            assert st["stalled_s"] > svc.stall_unhealthy_s
            # stop() must not hang on the wedged collector
            t0 = time.time()
            svc.stop(join_timeout_s=0.5)
            assert time.time() - t0 < 10
            assert svc._engine_error is not None
            assert "wedged" in str(svc._engine_error)
    finally:
        release.set()
        svc._decode = orig
        with pytest.raises(Exception):
            fut.result(timeout=5)

    # healthy control: a fresh service completes a window and reads
    # stalled_s == 0 when idle
    svc2 = GenerationService(params, const, mcfg, dcfg, gcfg,
                             buckets=(2,), max_wait_ms=5.0, base_seed=0)
    with svc2:
        svc2.submit(samples[0], seed=2).result(timeout=600)
        st = svc2.stats()
    assert st["pending"] == 0
    assert st["stalled_s"] == 0.0
