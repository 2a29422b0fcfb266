"""One-experiment kernel probe (tunnel-failure tolerant).

Usage: python scripts/kernel_probe.py <name> — runs a single configuration
and appends one line to scripts/probe_results.log. Designed to be re-invoked
per experiment so a tunnel outage only loses one measurement.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ragfin_tpu.ops import topk as T
from ragfin_tpu.ops.quantize import quantize_corpus_t

N, D, K = int(os.environ.get("PROBE_N", 1_000_000)), 384, 10
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_results.log")

EXPERIMENTS = {
    # Small-N compile canary: proves Mosaic compiles the fused kernel and the
    # tunnel round-trips, in seconds not minutes. Logged like any experiment.
    "canary_fused_64k": ("bf16", 2048, 8),
    "canary_int8_64k": ("int8", 2048, 8),
    "bf16_bn2048_q64": ("bf16", 2048, 64),
    "bf16_bn4096_q64": ("bf16", 4096, 64),
    "bf16_bn8192_q64": ("bf16", 8192, 64),
    "int8_bn2048_q64": ("int8", 2048, 64),
    "int8_bn4096_q64": ("int8", 4096, 64),
    "bf16_bn4096_q1024": ("bf16", 4096, 1024),
    "int8_bn4096_q1024": ("int8", 4096, 1024),
    "bf16_bn2048_q1024": ("bf16", 2048, 1024),
    "int8_bn2048_q1024": ("int8", 2048, 1024),
}


def _stage(msg: str) -> None:
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def oracle_check() -> None:
    """Correctness ON HARDWARE: compare fused-kernel ids/scores against the
    dense XLA path on the real chip at N=65536 (the CPU tests only cover
    interpret mode; Mosaic lowering differences would show up here)."""
    n, q, k = 65536, 64, 10
    key = jax.random.PRNGKey(3)
    ct = jax.random.normal(key, (D, n), jnp.float32)
    ct = ct / jnp.linalg.norm(ct, axis=0, keepdims=True)
    qs = jax.random.normal(jax.random.PRNGKey(4), (q, D), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    sf, if_ = T.cosine_topk_fused(qs, ct, k, precision="exact")
    sd, id_ = T.cosine_topk_dense(qs, ct, k, precision="exact")
    ids_match = bool(jnp.all(if_ == id_))
    score_err = float(jnp.max(jnp.abs(sf - sd)))
    line = f"oracle_check N={n}: ids_match={ids_match} max_score_err={score_err:.2e}"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)
    assert ids_match


def main(name: str) -> None:
    global N
    if name == "oracle_check":
        _stage(f"start oracle_check backend={jax.default_backend()}")
        return oracle_check()
    dtype, block_n, q = EXPERIMENTS[name]
    if name.startswith("canary"):
        N = 65536
    _stage(f"start {name} N={N} backend={jax.default_backend()}")

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (D, N), jnp.bfloat16)
        n2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return x * jax.lax.rsqrt(n2 + 1e-12)[None, :].astype(jnp.bfloat16)

    ct = gen(jax.random.PRNGKey(0))
    if dtype == "int8":
        c8, sc = quantize_corpus_t(ct)
        inner = lambda qq: T.cosine_topk_fused_int8(qq, c8, sc, K, block_n=block_n)
        np.asarray(c8[0, 0])
    else:
        inner = lambda qq: T.cosine_topk_fused(qq, ct, K, precision="fast", block_n=block_n)
        np.asarray(ct[0, 0])
    _stage("corpus generated + settled")

    R = 16
    keys = jax.random.split(jax.random.PRNGKey(1), R)
    qs = jax.vmap(lambda k: jax.random.normal(k, (q, D)))(keys)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)

    @jax.jit
    def run(qs):
        def step(carry, qq):
            s, i = inner(qq)
            return carry + s[0, 0] + i[0, 0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(step, 0.0, qs)
        return acc

    _stage("compiling + warmup")
    np.asarray(run(qs))
    _stage("warm; timing")
    t0 = time.perf_counter()
    np.asarray(run(qs))
    dt = (time.perf_counter() - t0) / R
    line = f"{name} N={N}: {dt * 1e3:.2f} ms/batch ({q / dt:,.0f} QPS)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main(sys.argv[1])
