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


def main(name: str) -> None:
    dtype, block_n, q = EXPERIMENTS[name]

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

    np.asarray(run(qs))
    t0 = time.perf_counter()
    np.asarray(run(qs))
    dt = (time.perf_counter() - t0) / R
    line = f"{name} N={N}: {dt * 1e3:.2f} ms/batch ({q / dt:,.0f} QPS)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main(sys.argv[1])
