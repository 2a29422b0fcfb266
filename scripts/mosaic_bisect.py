"""Bisect which op in the twolevel merge Mosaic fails to legalize.

Each case is a tiny standalone Pallas kernel compiled for TPU (compile-only:
errors surface at lowering, fast through the tunnel). Usage:
    python scripts/mosaic_bisect.py [case ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
_INT_MAX = 0x7FFFFFFF
TQ, TN, SUB = 64, 256, 128
NB = TN // SUB


def _run(kern, extra_scratch=()):
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((TQ, TN), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((TQ, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((TQ, 128), jnp.float32),
        scratch_shapes=list(extra_scratch),
    )(jnp.ones((TQ, TN), jnp.float32))
    return np.asarray(out)


def case_submax(x_ref, o_ref):
    cols = []
    for b in range(NB):
        sl = jax.lax.slice_in_dim(x_ref[:], b * SUB, (b + 1) * SUB, axis=1)
        cols.append(jnp.max(sl, axis=-1, keepdims=True))
    m = jnp.concatenate(cols, axis=1)
    o_ref[:] = jnp.broadcast_to(jnp.max(m, axis=-1, keepdims=True), (TQ, 128))


def case_anyaxis0(x_ref, o_ref):
    m = x_ref[:, :NB]
    hit = jnp.any(m > 0.5, axis=0, keepdims=True)  # [1, NB] sublane reduce
    o_ref[:] = jnp.broadcast_to(
        jnp.sum(jnp.where(hit, 1.0, 0.0), axis=-1, keepdims=True), (TQ, 128)
    )


def case_scalarmin_i32(x_ref, o_ref):
    m = x_ref[:, :NB]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (TQ, NB), 1)
    b = jnp.min(jnp.where(m > 0.5, iota_b, _INT_MAX))  # scalar i32 min
    o_ref[:] = jnp.full((TQ, 128), b.astype(jnp.float32))


def case_lanemin_then_scalar(x_ref, o_ref):
    m = x_ref[:, :NB]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (TQ, NB), 1)
    nxt = jnp.min(jnp.where(m > 0.5, iota_b, _INT_MAX), axis=-1)  # [TQ] lane reduce
    b = jnp.min(nxt)  # scalar from [TQ]
    o_ref[:] = jnp.full((TQ, 128), b.astype(jnp.float32))


def case_bufload(x_ref, o_ref, buf):
    for b in range(NB):
        buf[b] = jax.lax.slice_in_dim(x_ref[:], b * SUB, (b + 1) * SUB, axis=1)
    b = jnp.minimum(jnp.int32(1), x_ref[0, 0].astype(jnp.int32))  # traced scalar
    o_ref[:] = buf[b]


def case_retire(x_ref, o_ref):
    m = x_ref[:, :NB]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1)
    b = jnp.int32(1) * x_ref[0, 0].astype(jnp.int32)
    m = jnp.where(iota_b == b, NEG_INF, m)
    o_ref[:] = jnp.broadcast_to(jnp.max(m, axis=-1, keepdims=True), (TQ, 128))


def case_whileloop_m(x_ref, o_ref):
    """Outer while carrying [TQ, NB] f32 m + scalar extraction, no inner merge."""
    m0 = x_ref[:, :NB]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1)

    def cond(state):
        s, m = state
        return jnp.any(m > 0.5)

    def body(state):
        s, m = state
        nxt = jnp.min(jnp.where(m > 0.5, jnp.broadcast_to(iota_b, m.shape), _INT_MAX), axis=-1)
        b = jnp.min(nxt)
        m = jnp.where(iota_b == b, NEG_INF, m)
        return s + 1.0, m

    s, m = jax.lax.while_loop(cond, body, (jnp.float32(0.0), m0))
    o_ref[:] = jnp.full((TQ, 128), s)


def case_nested_insert(x_ref, o_ref, buf):
    """Outer while + buf[b] slice + _sorted_insert (no inner while)."""
    from ragfin_tpu.ops.topk import _sorted_insert

    k = 10
    for b in range(NB):
        buf[b] = jax.lax.slice_in_dim(x_ref[:], b * SUB, (b + 1) * SUB, axis=1)
    m0 = x_ref[:, :NB]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1)
    a_s0 = jnp.full((TQ, k), NEG_INF, jnp.float32)
    a_i0 = jnp.full((TQ, k), _INT_MAX, jnp.int32)

    def cond(state):
        a_s, a_i, m = state
        return jnp.any(m > a_s[:, k - 1][:, None])

    def body(state):
        a_s, a_i, m = state
        hit = jnp.any(m > a_s[:, k - 1][:, None], axis=0, keepdims=True)
        b = jnp.min(jnp.where(hit, iota_b, _INT_MAX))
        sl = buf[b]
        s = jnp.max(sl, axis=-1)
        ids = jnp.argmax(sl, axis=-1).astype(jnp.int32) + b * SUB
        a_s, a_i = _sorted_insert(a_s, a_i, s, ids, k)
        m = jnp.where(iota_b == b, NEG_INF, m)
        return a_s, a_i, m

    a_s, a_i, _ = jax.lax.while_loop(cond, body, (a_s0, a_i0, m0))
    o_ref[:] = jnp.broadcast_to(a_s[:, :1] + a_i[:, :1].astype(jnp.float32), (TQ, 128))


def case_nested_while(x_ref, o_ref, buf):
    """Full twolevel body: outer while + inner _stream_merge while."""
    from ragfin_tpu.ops.topk import _stream_merge

    k = 10
    for b in range(NB):
        buf[b] = jax.lax.slice_in_dim(x_ref[:], b * SUB, (b + 1) * SUB, axis=1)
    m0 = x_ref[:, :NB]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, NB), 1)
    a_s0 = jnp.full((TQ, k), NEG_INF, jnp.float32)
    a_i0 = jnp.full((TQ, k), _INT_MAX, jnp.int32)

    def cond(state):
        a_s, a_i, m = state
        return jnp.any(m > a_s[:, k - 1][:, None])

    def body(state):
        a_s, a_i, m = state
        hit = jnp.any(m > a_s[:, k - 1][:, None], axis=0, keepdims=True)
        b = jnp.min(jnp.where(hit, iota_b, _INT_MAX))
        a_s, a_i = _stream_merge(buf[b], b * SUB, a_s, a_i, k, invariant=True)
        m = jnp.where(iota_b == b, NEG_INF, m)
        return a_s, a_i, m

    a_s, a_i, _ = jax.lax.while_loop(cond, body, (a_s0, a_i0, m0))
    o_ref[:] = jnp.broadcast_to(a_s[:, :1] + a_i[:, :1].astype(jnp.float32), (TQ, 128))


CASES = {
    "submax": (case_submax, ()),
    "anyaxis0": (case_anyaxis0, ()),
    "scalarmin_i32": (case_scalarmin_i32, ()),
    "lanemin_then_scalar": (case_lanemin_then_scalar, ()),
    "bufload": (case_bufload, ((pltpu.VMEM((NB, TQ, SUB), jnp.float32)),)),
    "retire": (case_retire, ()),
    "whileloop_m": (case_whileloop_m, ()),
    "nested_insert": (case_nested_insert, ((pltpu.VMEM((NB, TQ, SUB), jnp.float32)),)),
    "nested_while": (case_nested_while, ((pltpu.VMEM((NB, TQ, SUB), jnp.float32)),)),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for name in names:
        kern, scratch = CASES[name]
        try:
            _run(kern, scratch)
            print(f"{name}: OK")
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAIL {msg}")
