"""A/B candidate exact top-k implementations for [B, 13317] k=10 on TPU.

Regime CLOSED (r03, docs/PERF.md): the grouped two-stage reduction wins
this standalone probe but LOSES in-program at both vocabs — 14% at
13,317 and 2× at the English 50,257 (token-identical outputs, so the
loss is pure reshape/pad/gather traffic that doesn't fuse into the
decode step). What actually wins at 50,257 is `lax.approx_max_k`
(recall 0.99): +16% end-to-end, `--topk_impl approx`."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mmtg_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

B, V, K = 512, 13317, 10
NEG_INF = -1e30
rng = np.random.default_rng(0)
logits = jnp.asarray(rng.standard_normal((B, V)), jnp.bfloat16)


@jax.jit
def direct(x):
    return jax.lax.top_k(x, K)


from functools import partial


def exact_top_k_grouped(
    logits: jnp.ndarray, k: int, group: int = 512
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via a two-stage group reduction.

    Any global top-k element is top-k within its group, so per-group
    top-k (``[B, G, group] → [B, G, k]``) followed by top-k over the
    ``G·k`` survivors is exact. Tie-breaking matches ``jax.lax.top_k``
    (lowest index first): groups are ordered by index and both stages
    keep the earlier candidate on equal values. On TPU the full-vocab
    TopK custom call is sort-bound (~53 GB/s on [512, 13317] bf16,
    0.26 ms per decode step at b512); the grouped form sorts 128-lane
    registers instead.
    """
    B, V = logits.shape
    if k > group or group >= V:
        # group-stage top-k needs k <= group; degenerate groupings gain
        # nothing — fall back to the exact full-vocab call
        return jax.lax.top_k(logits, min(k, V))
    G = -(-V // group)
    pad = G * group - V
    if pad:
        logits = jnp.pad(logits, ((0, 0), (0, pad)), constant_values=NEG_INF)
    v1, i1 = jax.lax.top_k(logits.reshape(B, G, group), k)  # [B, G, k]
    v2, i2 = jax.lax.top_k(v1.reshape(B, G * k), k)  # [B, k]
    grp = i2 // k
    within = jnp.take_along_axis(i1.reshape(B, G * k), i2, axis=1)
    return v2, grp * group + within




@partial(jax.jit, static_argnames=('group',))
def grouped(x, group=1024):
    # the shipped (tested) utility — probe the same code that ships
    return exact_top_k_grouped(x, K, group=group)


@jax.jit
def approx(x):
    return jax.lax.approx_max_k(x, K, recall_target=0.99, aggregate_to_topk=True)


def timeit(name, fn, *a):
    r = fn(*a)
    float(jnp.sum(r[0][:1].astype(jnp.float32)))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        r = fn(*a)
        float(jnp.sum(r[0][:1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(json.dumps({"impl": name, "p50_us": round(ts[10] * 1e6, 1)}), flush=True)
    return r


r1 = timeit("direct_topk", direct, logits)
r2 = timeit("grouped_1024", grouped, logits)
r3 = timeit("grouped_512", lambda x: grouped(x, group=512), logits)
r4 = timeit("approx_0.99", approx, logits)
# exactness: grouped values must equal direct values
print("grouped==direct:", bool(jnp.all(r1[0] == r2[0])), bool(jnp.all(r1[0] == r3[0])))
print("idx match:", bool(jnp.all(r1[1] == r2[1])))
