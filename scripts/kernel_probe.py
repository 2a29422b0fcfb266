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
from ragfin_tpu.utils.device import enable_compilation_cache

# Persistent compile cache: first-run probes seed it, re-runs measure the
# warm path (the serving-relevant number for big shapes like 10M graphs).
if os.environ.get("PROBE_COMPILE_CACHE", "1") == "1":
    enable_compilation_cache()

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
    # v2 = bf16 query cast for single-pass MXU (ops/topk.py _fused_call).
    "bf16v2_bn2048_q64": ("bf16", 2048, 64),
    "bf16v2_bn4096_q64": ("bf16", 4096, 64),
    "bf16v2_bn2048_q1024": ("bf16", 2048, 1024),
    # tenm_* = 10M-chunk corpus (BASELINE.json north star). int8 = 3.8GB,
    # bf16 = 7.7GB HBM resident.
    "tenm_int8_q1024": ("int8", 2048, 1024),
    "tenm_int8_q64": ("int8", 2048, 64),
    "tenm_bf16_q64": ("bf16", 2048, 64),
    # v3 = loop-invariant merge (RAGFIN_MERGE_VARIANT default "invariant").
    "bf16v3_bn2048_q64": ("bf16", 2048, 64),
    "int8v3_bn2048_q64": ("int8", 2048, 64),
    "bf16v3_bn2048_q1024": ("bf16", 2048, 1024),
    "int8v3_bn2048_q1024": ("int8", 2048, 1024),
    # q128 = one FULL query tile (no zero pads): isolates whether the Q=64
    # gap vs the ceiling probe comes from the 64 padded rows.
    "bf16v3_bn2048_q128": ("bf16", 2048, 128),
    "int8v3_bn2048_q128": ("int8", 2048, 128),
    # v4 = dimension_semantics=(parallel, arbitrary) compiler params.
    "bf16v4_bn2048_q64": ("bf16", 2048, 64),
    "bf16v4_bn2048_q1024": ("bf16", 2048, 1024),
    "int8v4_bn2048_q1024": ("int8", 2048, 1024),
    # v5 = corpus-major grid: each corpus tile read from HBM once and scored
    # against all query tiles (query-major re-read N per query tile).
    "bf16v5_bn2048_q64": ("bf16", 2048, 64),
    "bf16v5_bn2048_q1024": ("bf16", 2048, 1024),
    "int8v5_bn2048_q1024": ("int8", 2048, 1024),
    "int8v5_bn2048_q64": ("int8", 2048, 64),
    "bf16v5_bn2048_q4096": ("bf16", 2048, 4096),
    "int8v5_bn2048_q4096": ("int8", 2048, 4096),
    "tenmv5_int8_q1024": ("int8", 2048, 1024),
    # t = tile-major HBM layout [n_tiles, D, block_n] (tile_corpus_t):
    # every corpus-block DMA is one contiguous read instead of D=384
    # strided 4KB reads — tests whether the 291 GB/s effective bandwidth of
    # the flat layout (ceiling_1m) was DMA-stride-bound. 4-tuples add an
    # explicit merge slice width (s = sliced merge, _merge_tile_sliced);
    # slice 0 = whole-tile merge (the v1-v5 behavior).
    "bf16t_bn2048_q64": ("bf16", 2048, 64, 0),
    "int8t_bn2048_q64": ("int8", 2048, 64, 0),
    "bf16t_bn2048_q1024": ("bf16", 2048, 1024, 0),
    "int8t_bn2048_q1024": ("int8", 2048, 1024, 0),
    "bf16t_bn4096_q64": ("bf16", 4096, 64, 0),
    "tenmt_int8_q1024": ("int8", 2048, 1024, 0),
    "tenmt_int8_q64": ("int8", 2048, 64, 0),
    "tenmt_bf16_q64": ("bf16", 2048, 64, 0),
    # sliced merge A/B on the flat layout
    "bf16s256_bn2048_q64": ("bf16", 2048, 64, 256),
    "bf16s128_bn2048_q64": ("bf16", 2048, 64, 128),
    "bf16s512_bn2048_q64": ("bf16", 2048, 64, 512),
    "int8s256_bn2048_q64": ("int8", 2048, 64, 256),
    "bf16s256_bn2048_q1024": ("bf16", 2048, 1024, 256),
    "int8s256_bn2048_q1024": ("int8", 2048, 1024, 256),
    # tiled layout + sliced merge: the production candidate
    "bf16ts256_bn2048_q64": ("bf16", 2048, 64, 256),
    "int8ts256_bn2048_q64": ("int8", 2048, 64, 256),
    "bf16ts256_bn2048_q1024": ("bf16", 2048, 1024, 256),
    "int8ts256_bn2048_q1024": ("int8", 2048, 1024, 256),
    "bf16ts256_bn2048_q4096": ("bf16", 2048, 4096, 256),
    "int8ts256_bn2048_q4096": ("int8", 2048, 4096, 256),
    "tenmts256_int8_q1024": ("int8", 2048, 1024, 256),
    "tenmts256_int8_q64": ("int8", 2048, 64, 256),
    "tenmts256_bf16_q64": ("bf16", 2048, 64, 256),
    # m = mask-extraction merge variant (_stream_merge_mask; 5th field):
    # hit-bitmask + id-ordered extraction, ~half the VPU passes per
    # candidate and no unconditional row argmax.
    "bf16m_bn2048_q64": ("bf16", 2048, 64, 0, "mask"),
    "int8m_bn2048_q64": ("int8", 2048, 64, 0, "mask"),
    "bf16m_bn2048_q1024": ("bf16", 2048, 1024, 0, "mask"),
    "int8m_bn2048_q1024": ("int8", 2048, 1024, 0, "mask"),
    "bf16m_bn4096_q64": ("bf16", 4096, 64, 0, "mask"),
    "tenmm_int8_q1024": ("int8", 2048, 1024, 0, "mask"),
    "tenmm_int8_q64": ("int8", 2048, 64, 0, "mask"),
    "tenmm_bf16_q64": ("bf16", 2048, 64, 0, "mask"),
    "bf16m_bn2048_q4096": ("bf16", 2048, 4096, 0, "mask"),
    "int8m_bn2048_q4096": ("int8", 2048, 4096, 0, "mask"),
    # big-block experiments (6th field = block_q): ceiling_dma showed the
    # 1M-corpus floor is ~6us PER GRID STEP (266 GB/s at bn=2048), i.e.
    # step-overhead-bound not bandwidth-bound — quarter the step count with
    # bn=8192 (6MB tiles; block_q drops to 64 to fit VMEM: 2MB scores +
    # 2x6MB corpus buffers).
    "bf16big_bn8192_q64": ("bf16", 8192, 64, 0, "invariant", 64),
    "int8big_bn8192_q64": ("int8", 8192, 64, 0, "invariant", 64),
    "bf16big_bn8192_q1024": ("bf16", 8192, 1024, 0, "invariant", 64),
    "int8big_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 64),
    "bf16big_bn4096_q64": ("bf16", 4096, 64, 0, "invariant", 64),
    "int8big_bn16384_q1024": ("int8", 16384, 1024, 0, "invariant", 64),
    "tenmbig_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 64),
    # bf16 at bn=8192/bq=64 OOMs scoped VMEM (18.25M: 2x6.3M corpus buffers
    # + 2M f32 scores + acc); 6144 is the largest bf16 block that fits.
    "bf16big_bn6144_q64": ("bf16", 6144, 64, 0, "invariant", 64),
    "bf16big_bn6144_q1024": ("bf16", 6144, 1024, 0, "invariant", 64),
    "tenmbig_int8_bn8192_q64": ("int8", 8192, 64, 0, "invariant", 64),
    "int8big_bn8192_q128": ("int8", 8192, 128, 0, "invariant", 64),
    "int8big_bn8192_q256": ("int8", 8192, 256, 0, "invariant", 64),
    # v6 = gated n_valid masking (scalar pl.when around the merge) + deferred
    # per-row query scale in the int8 kernel. MEASURED SLOWER than big: the
    # conditional region breaks cross-step pipelining. Superseded by v7.
    "bf16v6_bn6144_q64": ("bf16", 6144, 64, 0, "invariant", 64),
    "bf16v6_bn6144_q1024": ("bf16", 6144, 1024, 0, "invariant", 64),
    "bf16v6_bn4096_q64": ("bf16", 4096, 64, 0, "invariant", 64),
    "int8v6_bn8192_q64": ("int8", 8192, 64, 0, "invariant", 64),
    "int8v6_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 64),
    "int8v6bq128_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 128),
    "tenmv6_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 64),
    "tenmv6_int8_bn8192_q64": ("int8", 8192, 64, 0, "invariant", 64),
    # v7 = unconditional masking via [1, TN] iota-row compare + ONE broadcast
    # select pass (vs the old full-tile iota+cmp+select ~3 passes), deferred
    # int8 query scale kept.
    "bf16v7_bn6144_q64": ("bf16", 6144, 64, 0, "invariant", 64),
    "bf16v7_bn6144_q1024": ("bf16", 6144, 1024, 0, "invariant", 64),
    "int8v7_bn8192_q64": ("int8", 8192, 64, 0, "invariant", 64),
    "int8v7_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 64),
    "tenmv7_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 64),
    "tenmv7_int8_bn8192_q64": ("int8", 8192, 64, 0, "invariant", 64),
    # bq32: halve the merge pass width again at large Q (scores [32, 8192]
    # = 1 MB f32); more grid steps but the corpus-major DMA is unchanged.
    "int8v7bq32_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 32),
    "bf16v7bq32_bn6144_q1024": ("bf16", 6144, 1024, 0, "invariant", 32),
    "int8v7bq16_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 16),
    # mask-extraction merge at the big config (fewer per-candidate passes).
    "int8v7m_bn8192_q1024": ("int8", 8192, 1024, 0, "mask", 64),
    "bf16bigm_bn8192_q1024": ("bf16", 8192, 1024, 0, "mask", 64),
    "int8bigm_bn8192_q1024": ("int8", 8192, 1024, 0, "mask", 64),
    # lz = maxlazy merge (_stream_merge_maxlazy): prologue is ONE row-max
    # pass (argmax deferred into the while body, recovered by equality +
    # min-iota) and, unlike "mask", no scalar pl.when branches — tests
    # whether v7's unconditional max+argmax prologue is the Q=1024 VPU tax.
    "int8lz_bn8192_q1024": ("int8", 8192, 1024, 0, "maxlazy", 64),
    "int8lz_bn8192_q64": ("int8", 8192, 64, 0, "maxlazy", 64),
    "bf16lz_bn6144_q1024": ("bf16", 6144, 1024, 0, "maxlazy", 64),
    "bf16lz_bn6144_q64": ("bf16", 6144, 64, 0, "maxlazy", 64),
    "tenmlz_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "maxlazy", 64),
    # maxlazy with a bigger query tile: per-element VPU work is unchanged
    # but grid steps halve (per-step overhead attribution at large Q).
    "int8lzbq128_bn8192_q1024": ("int8", 8192, 1024, 0, "maxlazy", 128),
    # invariant merge at block_q=128 (the lzbq128 win may be pure MXU
    # occupancy — a [128, 384] LHS fills the systolic array's sublanes).
    "int8bq128_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 128),
    "bf16bq128_bn4096_q1024": ("bf16", 4096, 1024, 0, "invariant", 128),
    "bf16bq128_bn6144_q1024": ("bf16", 6144, 1024, 0, "invariant", 128),
    "tenmbq128_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "invariant", 128),
    # twol_* = two-level in-tile selection (_merge_tile_twolevel): sub-block
    # maxima drive the merge; no full-tile mask/argmax passes. Flat layout
    # for apples-to-apples vs int8bq128/bf16v7 lines above ("tenmx" prefix =
    # 10M without the tiled-name trap).
    "canary_twol_64k": ("bf16", 2048, 8, 0, "twolevel", 64),
    "twol_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "twolevel", 128),
    "twol_int8_bn8192_q64": ("int8", 8192, 64, 0, "twolevel", 64),
    "twol_bf16_bn6144_q1024": ("bf16", 6144, 1024, 0, "twolevel", 64),
    "twol_bf16_bn6144_q64": ("bf16", 6144, 64, 0, "twolevel", 64),
    "tenmx_twol_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "twolevel", 128),
    # mlazy = sub-block-maxima prologue (~0.5 ms vs 4 full passes) + lazy
    # in-body id extraction; rows progress in parallel (no block walk).
    "mlazy_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "mlazy", 128),
    # bn8192 x bq128 OOMs scoped VMEM by 1.1M (body mask temps): smaller
    # corpus tile or query tile fits.
    "mlazy_int8_bn6144_q1024": ("int8", 6144, 1024, 0, "mlazy", 128),
    "mlazy_int8_bn8192bq64_q1024": ("int8", 8192, 1024, 0, "mlazy", 64),
    "tenmx_mlazy_int8_bn6144_q1024": ("int8", 6144, 1024, 0, "mlazy", 128),
    "lzbq128_int8_bn6144_q1024": ("int8", 6144, 1024, 0, "maxlazy", 128),
    "inv_int8_bn6144bq128_q1024": ("int8", 6144, 1024, 0, "invariant", 128),
    # maxlazy block-shape sweep around the 11.33 ms winner.
    "lzbq128_int8_bn4096_q1024": ("int8", 4096, 1024, 0, "maxlazy", 128),
    "lzbq256_int8_bn6144_q1024": ("int8", 6144, 1024, 0, "maxlazy", 256),
    "lzbq256_int8_bn4096_q1024": ("int8", 4096, 1024, 0, "maxlazy", 256),
    "lzbq128_bf16_bn4096_q1024": ("bf16", 4096, 1024, 0, "maxlazy", 128),
    "lzbq128_bf16_bn6144_q1024": ("bf16", 6144, 1024, 0, "maxlazy", 128),
    "tenmx_lzbq128_int8_bn6144_q1024": ("int8", 6144, 1024, 0, "maxlazy", 128),
    "tenmx_lzbq128_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "maxlazy", 128),
    "mlazy_int8_bn8192_q64": ("int8", 8192, 64, 0, "mlazy", 64),
    "mlazy_bf16_bn6144_q1024": ("bf16", 6144, 1024, 0, "mlazy", 64),
    "mlazy_bf16_bn6144_q64": ("bf16", 6144, 64, 0, "mlazy", 64),
    "tenmx_mlazy_int8_bn8192_q1024": ("int8", 8192, 1024, 0, "mlazy", 128),
    "tenmx_mlazy_int8_bn8192_q64": ("int8", 8192, 64, 0, "mlazy", 64),
}


def _stage(msg: str) -> None:
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def ceiling_q1024(which: str) -> None:
    """Ceiling decomposition AT THE PRODUCTION Q=1024 int8 CONFIG (bn=8192,
    bq=64, corpus-major grid, deferred query scale): same DMA/MXU/dequant/
    mask as the real kernel but the merge replaced by cheaper stand-ins.
    ``which``: 'mm' = matmul+dequant only; 'rowmax' = + n_valid mask +
    row-max (the minimum any exact-selection scheme must pay); 'prologue' =
    + row argmax (what the invariant merge pays before any iteration).
    The gap (kernel - prologue ceiling) is pure while-loop iteration cost.

    Integer modes (no f32 dequant anywhere — the cost model for a
    GLOBAL-scale int8 kernel whose selection runs on raw int32 scores):
    'mmint' = int32 matmul accumulate only; 'rowmaxint' = + int mask +
    int32 row-max. The mm - mmint gap is the per-tile [TQ, TN] f32
    dequant+materialization tax that per-column scales force on every
    selection scheme.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import re as _re

    bq = 64
    m = _re.match(r"([a-z]+)(\d+)$", which)
    if m:
        which, bq = m.group(1), int(m.group(2))
    n, bn, q = 1_000_000, 8192, 1024
    npad = -(-n // bn) * bn

    int_mode = which in ("mmint", "rowmaxint")
    acc_dtype = jnp.int32 if int_mode else jnp.float32

    def kern(q_ref, ct_ref, cs_ref, out_ref, acc):
        j = pl.program_id(0)
        i = pl.program_id(1)
        rows = pl.ds(i * bq, bq)

        @pl.when(j == 0)
        def _init():
            acc[rows] = jnp.zeros((bq, 1), acc_dtype)

        int_scores = jnp.dot(q_ref[:], ct_ref[:], preferred_element_type=jnp.int32)
        if which == "mmint":
            acc[rows] = acc[rows] + int_scores[:, :1]
        elif which == "rowmaxint":
            col0 = j * bn
            iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
            masked = jnp.where(
                (col0 + iota_row) < n, int_scores, jnp.int32(-(2**31) + 1)
            )
            acc[rows] = acc[rows] + jnp.max(masked, axis=-1, keepdims=True)
        elif which == "mm":
            scores = int_scores.astype(jnp.float32) * cs_ref[:]
            acc[rows] = acc[rows] + scores[:, :1]
        else:
            scores = int_scores.astype(jnp.float32) * cs_ref[:]
            col0 = j * bn
            iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
            scores = jnp.where((col0 + iota_row) < n, scores, T.NEG_INF)
            if which == "rowmax":
                acc[rows] = acc[rows] + jnp.max(scores, axis=-1, keepdims=True)
            else:  # prologue
                m = jnp.max(scores, axis=-1, keepdims=True)
                a = jnp.argmax(scores, axis=-1).astype(jnp.float32)
                acc[rows] = acc[rows] + m + a[:, None]

        @pl.when(j == pl.num_programs(0) - 1)
        def _flush():
            out_ref[:] = acc[rows].astype(out_ref.dtype)

    ct = jax.random.normal(jax.random.PRNGKey(0), (D, npad), jnp.bfloat16)
    c8, cs = quantize_corpus_t(ct)
    q8 = jax.random.randint(jax.random.PRNGKey(1), (q, D), -127, 127, jnp.int8)
    np.asarray(c8[0, 0])

    def one(qq, c, s):
        return pl.pallas_call(
            kern,
            grid=(npad // bn, q // bq),
            in_specs=[
                pl.BlockSpec((bq, D), lambda j, i: (i, 0)),
                pl.BlockSpec((D, bn), lambda j, i: (0, j)),
                pl.BlockSpec((1, bn), lambda j, i: (0, j)),
            ],
            out_specs=pl.BlockSpec((bq, 1), lambda j, i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((q, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((q, 1), acc_dtype)],
        )(qq, c, s)

    @jax.jit
    def run(qs, c, s):
        def step(carry, _):
            return carry + one(qs, c, s)[0, 0], None
        acc, _ = jax.lax.scan(step, 0.0, jnp.arange(4))
        return acc

    _stage(f"ceiling_q1024_{which}: compiling")
    np.asarray(run(q8, c8, cs))
    t0 = time.perf_counter()
    np.asarray(run(q8, c8, cs))
    dt = (time.perf_counter() - t0) / 4
    line = f"ceiling_q1024_{which} int8 bn=8192 bq={bq}: {dt*1e3:.2f} ms/batch (Q=1024)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception as e:  # tunnel hiccup — not worth failing a probe
        return f"unknown ({e})"


def oracle_check(padded: bool = False) -> None:
    """Correctness ON HARDWARE: compare fused-kernel ids/scores against the
    dense XLA path on the real chip at N=65536 (the CPU tests only cover
    interpret mode; Mosaic lowering differences would show up here).

    ``padded`` trims n_valid below a block boundary so the final corpus tile
    takes the gated masking branch (pl.when) on hardware, and also runs the
    int8 kernel (deferred query scale) against its dequantized-dense oracle."""
    n, q, k = 65536, 64, 10
    n_valid = (n - 1234) if padded else None
    key = jax.random.PRNGKey(3)
    ct = jax.random.normal(key, (D, n), jnp.float32)
    ct = ct / jnp.linalg.norm(ct, axis=0, keepdims=True)
    qs = jax.random.normal(jax.random.PRNGKey(4), (q, D), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    sf, if_ = T.cosine_topk_fused(qs, ct, k, n_valid=n_valid, precision="exact")
    sd, id_ = T.cosine_topk_dense(qs, ct, k, n_valid=n_valid, precision="exact")
    ids_match = bool(jnp.all(if_ == id_))
    score_err = float(jnp.max(jnp.abs(sf - sd)))
    tag = "oracle_check_padded" if padded else "oracle_check"
    extra = ""
    if padded:
        c8, sc = quantize_corpus_t(ct.astype(jnp.bfloat16))
        s8, i8 = T.cosine_topk_fused_int8(qs, c8, sc, k, n_valid=n_valid)
        dq = c8.astype(jnp.float32) * sc
        sd8, id8 = T.cosine_topk_dense(qs, dq, k, n_valid=n_valid, precision="exact")
        i8_match = bool(jnp.all(i8 == id8))
        s8_err = float(jnp.max(jnp.abs(s8 - sd8)))
        extra = f" int8_ids_match={i8_match} int8_score_err={s8_err:.2e}"
        assert int(jnp.max(if_)) < n_valid and int(jnp.max(i8)) < n_valid
    line = f"{tag} N={n}: ids_match={ids_match} max_score_err={score_err:.2e}{extra}"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)
    assert ids_match


def oracle_check_bigq() -> None:
    """Hardware oracle at the LARGE-Q production defaults (maxlazy merge +
    block_q=128, ops/topk.py _default_variant/_default_blocks): the maxlazy
    while-body's Mosaic lowering only executes on hardware, so CPU-interpret
    parity does not cover it. bf16 fast tier vs the dense fast path (same
    bf16 MXU products); int8 fused (deferred query scale) vs the dense int8
    path (same int32 dot products — only the f32 dequant association
    differs, so ids may flip only on f32-rounding ties)."""
    n, q, k = 65536, 1024, 10
    n_valid = n - 1234
    ct = jax.random.normal(jax.random.PRNGKey(3), (D, n), jnp.float32)
    ct = (ct / jnp.linalg.norm(ct, axis=0, keepdims=True)).astype(jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(4), (q, D), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    sf, if_ = T.cosine_topk_fused(qs, ct, k, n_valid=n_valid, precision="fast")
    sd, id_ = T.cosine_topk_dense(qs, ct, k, n_valid=n_valid, precision="fast")
    bf_match = float(jnp.mean((if_ == id_).astype(jnp.float32)))
    bf_err = float(jnp.max(jnp.abs(sf - sd)))
    c8, sc = quantize_corpus_t(ct)
    s8, i8 = T.cosine_topk_fused_int8(qs, c8, sc, k, n_valid=n_valid)
    sd8, id8 = T.cosine_topk_dense_int8(qs, c8, sc, k, n_valid=n_valid)
    i8_match = float(jnp.mean((i8 == id8).astype(jnp.float32)))
    s8_err = float(jnp.max(jnp.abs(s8 - sd8)))
    assert int(jnp.max(if_)) < n_valid and int(jnp.max(i8)) < n_valid
    line = (
        f"oracle_check_bigq N={n} Q={q}: bf16_ids_frac={bf_match:.4f} "
        f"bf16_score_err={bf_err:.2e} int8_ids_frac={i8_match:.4f} "
        f"int8_score_err={s8_err:.2e}"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)
    assert bf_match > 0.999 and i8_match > 0.999
    assert bf_err < 1e-2 and s8_err < 1e-2


def noscan_1m() -> None:
    """Isolate compile vs run at 1M: single direct fused call, no scan."""
    n, q, k = 1_000_000, 64, 10
    _stage("noscan_1m: gen corpus")
    ct = jax.random.normal(jax.random.PRNGKey(0), (D, n), jnp.bfloat16)
    np.asarray(ct[0, 0])
    qs = jax.random.normal(jax.random.PRNGKey(1), (q, D), jnp.float32)
    _stage("noscan_1m: compiling single call")
    t0 = time.perf_counter()
    s, i = T.cosine_topk_fused(qs, ct, k, precision="fast")
    np.asarray(s[0, 0])
    compile_s = time.perf_counter() - t0
    _stage(f"noscan_1m: compiled+ran in {compile_s:.1f}s; timing 4 execs")
    t0 = time.perf_counter()
    for _ in range(4):
        s, i = T.cosine_topk_fused(qs, ct, k, precision="fast")
    np.asarray(s[0, 0])
    dt = (time.perf_counter() - t0) / 4
    line = f"noscan_1m compile+first={compile_s:.1f}s exec={dt*1e3:.2f} ms/batch (dispatch incl.)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def shardmap_fused_1dev(tag: str = "shardmap_fused_1dev") -> None:
    """Production composition on hardware (round-1 verdict #7): the fused
    Pallas kernel inside shard_map on a 1-device mesh — proves the
    combination compiles and runs on TPU even without multi-chip."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ragfin_tpu.parallel.sharded import sharded_cosine_topk

    n, q, k = 1_000_000, 64, 10
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    _stage("shardmap: gen corpus")
    ct = jax.random.normal(jax.random.PRNGKey(0), (D, n), jnp.bfloat16)
    ct = jax.device_put(ct, NamedSharding(mesh, P(None, "data")))
    np.asarray(ct[0, 0])
    qs = jax.random.normal(jax.random.PRNGKey(1), (q, D), jnp.float32)
    _stage("shardmap: compiling fused-in-shard_map")
    t0 = time.perf_counter()
    s, i = sharded_cosine_topk(mesh, "data", qs, ct, k, n_valid=n, method="fused")
    np.asarray(s[0, 0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(4):
        s, i = sharded_cosine_topk(mesh, "data", qs, ct, k, n_valid=n, method="fused")
    np.asarray(s[0, 0])
    dt = (time.perf_counter() - t0) / 4
    line = f"{tag} compile={compile_s:.1f}s exec={dt*1e3:.2f} ms/batch (dispatch incl.)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def shardmap_attrib_1dev() -> None:
    """Attribute the shard_map 1-device overhead (round-2 verdict Weak #7:
    13.15 ms shard_map-fused vs 5.13 ms direct). Four measurements:
    a) direct fused, eager loop      (dispatch-included baseline)
    b) shard_map fused, eager loop   (the 13.15 ms configuration)
    c) direct fused in a jitted scan (device-only baseline)
    d) shard_map fused in a jitted scan (device-only shard_map cost)
    (b-a) is host-side per-dispatch overhead of the shard_map program
    (placement checks/donation/layout on call); (d-c) is the device-side
    cost of the wrapper (collectives + replication copies), which is what
    would actually scale to an 8-chip mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ragfin_tpu.parallel.sharded import _sharded_program, sharded_cosine_topk

    n, q, k = 1_000_000, 64, 10
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    _stage("shardmap_attrib: gen corpus")
    ct = jax.random.normal(jax.random.PRNGKey(0), (D, n), jnp.bfloat16)
    ct_sh = jax.device_put(ct, NamedSharding(mesh, P(None, "data")))
    np.asarray(ct_sh[0, 0])
    qs = jax.random.normal(jax.random.PRNGKey(1), (q, D), jnp.float32)

    def timed(fn, reps=8):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out)
        return (time.perf_counter() - t0) / reps * 1e3

    _stage("shardmap_attrib: a) direct eager")
    a = timed(lambda: T.cosine_topk_fused(qs, ct, k, n_valid=n, precision="fast")[0])
    _stage("shardmap_attrib: b) shard_map eager")
    b = timed(
        lambda: sharded_cosine_topk(mesh, "data", qs, ct_sh, k, n_valid=n, method="fused")[0]
    )

    qs8 = jnp.broadcast_to(qs, (8, q, D))

    @jax.jit
    def scan_direct(qs8, c):
        def step(carry, qq):
            s, i = T.cosine_topk_fused(qq, c, k, n_valid=n, precision="fast")
            return carry + s[0, 0], None
        acc, _ = jax.lax.scan(step, 0.0, qs8)
        return acc

    program = _sharded_program(mesh, "data", k, n, "fused", "exact", ct_sh.shape[1], False)

    @jax.jit
    def scan_shard(qs8, c):
        def step(carry, qq):
            s, i = program(qq, c)
            return carry + s[0, 0], None
        acc, _ = jax.lax.scan(step, 0.0, qs8)
        return acc

    _stage("shardmap_attrib: c) direct in scan")
    np.asarray(scan_direct(qs8, ct))
    t0 = time.perf_counter()
    np.asarray(scan_direct(qs8, ct))
    c = (time.perf_counter() - t0) / 8 * 1e3
    _stage("shardmap_attrib: d) shard_map in scan")
    np.asarray(scan_shard(qs8, ct_sh))
    t0 = time.perf_counter()
    np.asarray(scan_shard(qs8, ct_sh))
    d = (time.perf_counter() - t0) / 8 * 1e3

    line = (
        f"shardmap_attrib_1dev direct_eager={a:.2f} shard_eager={b:.2f} "
        f"direct_scan={c:.2f} shard_scan={d:.2f} ms/batch "
        f"(host_dispatch_overhead={b - a:.2f}, device_wrapper_cost={d - c:.2f})"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def graph_match_10m() -> None:
    """Graph-store match latency at 10M facts on TPU (round-1 verdict #5).

    Builds the columnar store with bulk ingestion, then times the scale
    match path (vectorized predicate + streaming Pallas first-k)."""
    from ragfin_tpu.index.graph_index import METRIC, GraphIndex

    n = 10_000_000
    g = GraphIndex()
    rng = np.random.default_rng(0)
    _stage("graph: generating 10M facts")
    quarters = [f"Q{q}_FY{y}" for y in range(2018, 2025) for q in range(1, 5)]
    qv = g.intern_quarters(quarters)
    ev = g.intern_entities([f"Metric {i}" for i in range(512)])
    g.add_facts_bulk(
        quarter_ids=qv[rng.integers(0, len(qv), n)],
        entity_ids=ev[rng.integers(0, len(ev), n)],
        type_ids=rng.integers(0, 4, n).astype(np.int32),
        values=rng.uniform(1, 1e5, n).astype(np.float32),
    )
    _stage("graph: packing + device transfer")
    t0 = time.perf_counter()
    g._pack()
    pack_s = time.perf_counter() - t0
    _stage(f"graph: packed in {pack_s:.1f}s; first match (compile)")
    t0 = time.perf_counter()
    out = g.match(quarters=["Q1_FY2024"], names=["Metric 7"], types=[METRIC], limit=30)
    first_s = time.perf_counter() - t0
    assert out, "match returned nothing"
    t0 = time.perf_counter()
    reps = 8
    for i in range(reps):
        g.match(quarters=[f"Q{1 + i % 4}_FY2023"], names=[f"Metric {i}"], types=[METRIC], limit=30)
    dt = (time.perf_counter() - t0) / reps
    agg = g.aggregate(names=["Metric 3"], field="value")
    line = (
        f"graph_match_10m pack={pack_s:.1f}s first={first_s:.1f}s "
        f"match={dt*1e3:.2f} ms (dispatch incl.), aggregate_count={agg['count']}"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def graph_match_attrib() -> None:
    """Attribute the warm 10M-fact match: device compute vs dispatch, and
    predicate vs first-k within the device part.

    Runs the scale-match device stages for 8 different mask triples inside
    ONE jitted lax.scan each — amortized per-match device time, no per-call
    tunnel round trips. The eager graph_match_10m 'match=' line minus
    'both' is pure dispatch. (This probe split the pre-fix 98 ms into
    97.9 ms gather-bound predicate + 3.9 ms Pallas first-k, motivating the
    gather-free _mask_lookup.)"""
    from ragfin_tpu.index.graph_index import _predicate, masked_first_k

    n, reps, k = 10_000_000, 8, 30
    rng = np.random.default_rng(0)
    nq, ne = 28, 512
    qids = jnp.asarray(rng.integers(0, nq, n).astype(np.int32))
    eids = jnp.asarray(rng.integers(0, ne, n).astype(np.int32))
    tids = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
    valid = jnp.ones((n,), bool)
    qms = np.zeros((reps, nq), bool)
    ems = np.zeros((reps, ne), bool)
    tms = np.zeros((reps, 4), bool)
    for i in range(reps):
        qms[i, i % nq] = True
        ems[i, i] = True
        tms[i, 0] = True
    qms, ems, tms = jnp.asarray(qms), jnp.asarray(ems), jnp.asarray(tms)
    hits = jnp.stack(
        [_predicate(qids, eids, tids, valid, qms[i], ems[i], tms[i]) for i in range(reps)]
    )
    np.asarray(hits[0, 0])

    def timed(fn, *args):
        run = jax.jit(fn)
        np.asarray(run(*args))
        t0 = time.perf_counter()
        np.asarray(run(*args))
        return (time.perf_counter() - t0) / reps * 1e3

    def pred_only(qids, eids, tids, valid, qms, ems, tms):
        def step(c, x):
            qm, em, tm = x
            h = _predicate(qids, eids, tids, valid, qm, em, tm)
            return c + jnp.sum(h.astype(jnp.int32)), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), (qms, ems, tms))
        return acc

    def fk_only(hits):
        def step(c, h):
            ids, cnt = masked_first_k(h, k)
            return c + ids.sum() + cnt.sum(), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), hits)
        return acc

    def both(qids, eids, tids, valid, qms, ems, tms):
        def step(c, x):
            qm, em, tm = x
            h = _predicate(qids, eids, tids, valid, qm, em, tm)
            ids, cnt = masked_first_k(h, k)
            return c + ids.sum() + cnt.sum(), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), (qms, ems, tms))
        return acc

    _stage("graph_match_attrib: compiling + timing")
    t_pred = timed(pred_only, qids, eids, tids, valid, qms, ems, tms)
    t_fk = timed(fk_only, hits)
    t_both = timed(both, qids, eids, tids, valid, qms, ems, tms)
    line = (
        f"graph_match_attrib N=10M: pred={t_pred:.2f} fk={t_fk:.2f} "
        f"both={t_both:.2f} ms/match (scan-amortized)"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def minilm_encode() -> None:
    """T1 perf: MiniLM-L6 batch-encode throughput on TPU (chunks/s).

    Random-init weights (no checkpoint in image) — identical FLOPs to the
    pretrained model. B=256 texts of S=128 tokens per batch, bf16 activations,
    amortized over 16 batches in one jitted lax.scan."""
    from ragfin_tpu.models.minilm import MiniLMConfig, MiniLMEncoder, init_params

    cfg = MiniLMConfig()
    B, S, R = 256, 128, 16
    enc = MiniLMEncoder(cfg)
    params = init_params(cfg, seed=0)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (R, B, S)), jnp.int32)
    amask = jnp.ones((R, B, S), jnp.int32)

    @jax.jit
    def run(params, ids, amask):
        def step(carry, x):
            i, m = x
            emb = enc.apply(params, i, m)
            return carry + emb[0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(step, 0.0, (ids, amask))
        return acc

    _stage("minilm_encode: compiling")
    np.asarray(run(params, ids, amask))
    t0 = time.perf_counter()
    np.asarray(run(params, ids, amask))
    dt = (time.perf_counter() - t0) / R
    line = (
        f"minilm_encode B={B} S={S} bf16: {dt*1e3:.2f} ms/batch "
        f"({B/dt:,.0f} chunks/s)"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def ceiling_1m() -> None:
    """Perf ceiling probe: same grid/DMA/matmul/row-max as the fused kernel
    but NO merge (results are wrong on purpose) — separates the cost of the
    data movement + MXU from the while-loop selection."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, q, k, bn = 1_000_000, 64, 10, 2048

    def kern(q_ref, ct_ref, out_ref, acc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        s = jnp.dot(q_ref[:], ct_ref[:], preferred_element_type=jnp.float32)
        acc[:] = acc[:] + jnp.max(s, axis=-1, keepdims=True)

        @pl.when(j == pl.num_programs(1) - 1)
        def _flush():
            out_ref[:] = acc[:]

    ct = jax.random.normal(jax.random.PRNGKey(0), (D, n), jnp.bfloat16)
    npd = n  # already multiple of 2048
    qs16 = jax.random.normal(jax.random.PRNGKey(1), (16, 128, D), jnp.bfloat16)
    np.asarray(ct[0, 0])

    def one(qq, c):
        return pl.pallas_call(
            kern,
            grid=(1, npd // bn),
            in_specs=[
                pl.BlockSpec((128, D), lambda i, j: (i, 0)),
                pl.BlockSpec((D, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((128, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 1), jnp.float32)],
        )(qq, c)

    @jax.jit
    def run(qs16, c):
        def step(carry, qq):
            return carry + one(qq, c)[0, 0], None
        acc, _ = jax.lax.scan(step, 0.0, qs16)
        return acc

    _stage("ceiling: compiling")
    np.asarray(run(qs16, ct))
    t0 = time.perf_counter()
    np.asarray(run(qs16, ct))
    dt = (time.perf_counter() - t0) / 16
    line = f"ceiling_1m matmul+rowmax only: {dt*1e3:.2f} ms/batch (Q=64 eq)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def ivf_probe(name: str) -> None:
    """IVF cluster-pruned tier on hardware: clustered synthetic corpus
    (256 centers + noise), queries near corpus points. Logs ms/batch, QPS
    and measured recall@10 vs the exact fused kernel on the same batch.

    Names: ivf<nprobe>[bq<bq>]_<dtype>_q<Q> (1M) or tenm_ivf... (10M).
    Probes are selected PER QUERY TILE (cells are kernel blocks), so for
    independent random queries the honest config is a small block_q (its own
    probe list per few queries); block_q=128 with diverse queries shares one
    probe list across 128 rows and recall collapses by design."""
    import re

    from ragfin_tpu.ops.ivf import build_ivf, ivf_topk

    m = re.match(r"(tenm_)?ivf(\d+)(?:bq(\d+))?_(bf16|int8)_q(\d+)$", name)
    tenm, nprobe, bq, dtype, q = m.groups()
    # Cell-aligned N: a non-multiple would make build_ivf pad-copy the
    # whole corpus (a second 7.7 GB buffer at 10M — HBM OOM).
    n = 4883 * 2048 if tenm else 1_000_000
    nprobe, q, k = int(nprobe), int(q), 10
    bq = int(bq) if bq else 128
    _stage(f"start {name} N={n} backend={jax.default_backend()} device={_device_kind()}")

    @jax.jit
    def gen(key):
        # Built directly in the transposed [D, n] bf16 layout: the f32 [n, D]
        # intermediate (15.4 GB at 10M) OOMs a 16 GB chip.
        kc, kn, kq = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (256, D), jnp.float32)
        which = jax.random.randint(kn, (n,), 0, 256)
        x = centers.T.astype(jnp.bfloat16)[:, which] * jnp.bfloat16(4.0)
        x = x + jax.random.normal(kq, (D, n), jnp.bfloat16)
        n2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return x * jax.lax.rsqrt(n2 + 1e-12)[None, :].astype(jnp.bfloat16)

    ct = gen(jax.random.PRNGKey(0))
    np.asarray(ct[0, 0])
    _stage("clustered corpus generated")

    kq = jax.random.PRNGKey(5)
    picks = jax.random.randint(kq, (q,), 0, n)
    qs = ct[:, picks].T.astype(jnp.float32) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(6), (q, D), jnp.float32
    )
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    np.asarray(qs[0, 0])

    if tenm:
        # 10M: source (7.7 GB) + int8 cells cannot coexist with an extra
        # gather copy — drop our reference and let build_ivf free it after
        # quantization; the recall oracle is then exhaustive-nprobe IVF
        # (== exact over the same corpus, tested in tests/test_ivf.py).
        # Hand off the ONLY reference (list.pop) so build_ivf's internal
        # `del` actually frees the source; a lingering local here would
        # keep the 7.7 GB buffer alive through the gather.
        holder = [ct]
        ct = None
        idx = build_ivf(holder.pop(), cell=2048, iters=3,
                        quantize=(dtype == "int8"), free_source=True)
        np.asarray(idx.centroids[0, 0])
        _stage(f"ivf built: {idx.n_cells} cells; exhaustive oracle")
        so, io = ivf_topk(qs, idx, k, nprobe=idx.n_cells, block_q=bq)
    else:
        idx = build_ivf(ct, cell=2048, iters=3, quantize=(dtype == "int8"))
        np.asarray(idx.centroids[0, 0])
        _stage(f"ivf built: {idx.n_cells} cells")
        # Recall oracle: exact fused top-k over the same corpus.
        so, io = T.cosine_topk_fused(qs, ct, k, precision="fast")
    si, ii = ivf_topk(qs, idx, k, nprobe=nprobe, block_q=bq)
    io_np, ii_np = np.asarray(io), np.asarray(ii)
    recall = np.mean(
        [len(set(ii_np[r]) & set(io_np[r])) / k for r in range(q)]
    )
    _stage(f"recall@10 vs exact = {recall:.4f}; timing")

    R = 16
    qsR = jnp.broadcast_to(qs, (R, q, D))

    @jax.jit
    def run(qsR, cells, scales, centroids, orig_ids):
        from ragfin_tpu.ops.ivf import IVFIndex

        ix = IVFIndex(cells, scales, centroids, orig_ids, idx.n_valid)

        def step(carry, qq):
            s, i = ivf_topk(qq, ix, k, nprobe=nprobe, block_q=bq)
            return carry + s[0, 0] + i[0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(step, 0.0, qsR)
        return acc

    args = (qsR, idx.cells, idx.scales, idx.centroids, idx.orig_ids)
    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    dt = (time.perf_counter() - t0) / R
    line = (
        f"{name} N={n}: {dt * 1e3:.2f} ms/batch ({q / dt:,.0f} QPS) "
        f"recall@10={recall:.4f} nprobe={nprobe}/{idx.n_cells}"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def ceiling_parts_1m(which: str) -> None:
    """Decompose ceiling_1m: ``dma`` = block DMA only (body touches one
    element), ``matmul`` = DMA + matmul (no row-max), ``rowmax`` = the
    original DMA + matmul + row-max. A numeric suffix overrides block_n
    (e.g. ``dma8192``) — tests the per-grid-step-overhead hypothesis."""
    import re

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, bn = 1_000_000, 2048
    tag = which
    m = re.match(r"([a-z]+)(\d+)$", which)
    if m:
        which, bn = m.group(1), int(m.group(2))
    if n % bn:
        n = (n // bn) * bn  # probe-only: trim to an integral grid

    def kern(q_ref, ct_ref, out_ref, acc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        if which == "dma":
            # Full-block store (Mosaic rejects scalar stores to VMEM) and a
            # 32-bit-cast [1,1] read (Mosaic rejects bf16 scalar extracts);
            # keeps the block DMA live with near-zero VPU work.
            acc[:] = acc[:] + jnp.sum(ct_ref[0:1, 0:1].astype(jnp.float32))
        else:
            s = jnp.dot(q_ref[:], ct_ref[:], preferred_element_type=jnp.float32)
            if which == "matmul":
                acc[:] = acc[:] + s[:, :1]
            else:
                acc[:] = acc[:] + jnp.max(s, axis=-1, keepdims=True)

        @pl.when(j == pl.num_programs(1) - 1)
        def _flush():
            out_ref[:] = acc[:]

    ct = jax.random.normal(jax.random.PRNGKey(0), (D, n), jnp.bfloat16)
    qs16 = jax.random.normal(jax.random.PRNGKey(1), (16, 128, D), jnp.bfloat16)
    np.asarray(ct[0, 0])

    def one(qq, c):
        return pl.pallas_call(
            kern,
            grid=(1, n // bn),
            in_specs=[
                pl.BlockSpec((128, D), lambda i, j: (i, 0)),
                pl.BlockSpec((D, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((128, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 1), jnp.float32)],
        )(qq, c)

    @jax.jit
    def run(qs16, c):
        def step(carry, qq):
            return carry + one(qq, c)[0, 0], None
        acc, _ = jax.lax.scan(step, 0.0, qs16)
        return acc

    _stage(f"ceiling_{which}: compiling")
    np.asarray(run(qs16, ct))
    t0 = time.perf_counter()
    np.asarray(run(qs16, ct))
    dt = (time.perf_counter() - t0) / 16
    line = f"ceiling_{tag}_1m: {dt*1e3:.2f} ms/batch (Q=64 eq, 768MB read, bn={bn})"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def ceiling_tiled_1m() -> None:
    """ceiling_1m with the tile-major corpus layout: one contiguous DMA per
    corpus block instead of 384 strided reads. The delta vs ceiling_1m is
    pure HBM-access-pattern cost."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, bn = 1_000_000, 2048

    def kern(q_ref, ct_ref, out_ref, acc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        s = jnp.dot(q_ref[:], ct_ref[0], preferred_element_type=jnp.float32)
        acc[:] = acc[:] + jnp.max(s, axis=-1, keepdims=True)

        @pl.when(j == pl.num_programs(1) - 1)
        def _flush():
            out_ref[:] = acc[:]

    ct = jax.random.normal(jax.random.PRNGKey(0), (D, n), jnp.bfloat16)
    tiles = T.tile_corpus_t(ct, block_n=bn)
    qs16 = jax.random.normal(jax.random.PRNGKey(1), (16, 128, D), jnp.bfloat16)
    np.asarray(tiles[0, 0, 0])

    def one(qq, c):
        return pl.pallas_call(
            kern,
            grid=(1, n // bn),
            in_specs=[
                pl.BlockSpec((128, D), lambda i, j: (i, 0)),
                pl.BlockSpec((1, D, bn), lambda i, j: (j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((128, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 1), jnp.float32)],
        )(qq, c)

    @jax.jit
    def run(qs16, c):
        def step(carry, qq):
            return carry + one(qq, c)[0, 0], None
        acc, _ = jax.lax.scan(step, 0.0, qs16)
        return acc

    _stage("ceiling_tiled: compiling")
    np.asarray(run(qs16, tiles))
    t0 = time.perf_counter()
    np.asarray(run(qs16, tiles))
    dt = (time.perf_counter() - t0) / 16
    line = f"ceiling_tiled_1m matmul+rowmax only: {dt*1e3:.2f} ms/batch (Q=64 eq)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def adversarial_1m() -> None:
    """Worst case for the streaming merge: corpus columns sorted ascending
    by score against the query direction, so every tile improves the running
    top-k k times (round-1 verdict #2 asks for this measured)."""
    n, q, k, bn = 1_000_000, 64, 10, None  # None = production defaults
    _stage("adversarial: building sorted corpus")
    key = jax.random.PRNGKey(0)
    d0 = jax.random.normal(jax.random.PRNGKey(9), (D,), jnp.float32)
    d0 = d0 / jnp.linalg.norm(d0)

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (D, n), jnp.bfloat16)
        nrm = jnp.sqrt(jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32))
        x = x / nrm[None, :].astype(jnp.bfloat16)
        scores = d0.astype(jnp.bfloat16) @ x
        order = jnp.argsort(scores)  # ascending: later ids always improve
        return x[:, order]

    ct = gen(key)
    np.asarray(ct[0, 0])
    # Queries clustered near d0 so the ascending order is adversarial for all.
    qs = d0[None, :] + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (q, D), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    qs16 = jnp.broadcast_to(qs, (8, q, D))

    @jax.jit
    def run(qs16, c):
        def step(carry, qq):
            s, i = T.cosine_topk_fused(qq, c, k, precision="fast", block_n=bn)
            return carry + s[0, 0] + i[0, 0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(step, 0.0, qs16)
        return acc

    _stage("adversarial: compiling")
    np.asarray(run(qs16, ct))
    t0 = time.perf_counter()
    np.asarray(run(qs16, ct))
    dt = (time.perf_counter() - t0) / 8
    line = f"adversarial_1m ascending-order bf16: {dt*1e3:.2f} ms/batch (Q=64)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def ceiling_q64(which: str) -> None:
    """Ceiling decomposition AT THE PRODUCTION Q=64 bf16 CONFIG (round-3
    verdict #5 — third ask): bn=6144, bq=64, corpus-major grid, fast tier
    (bf16 queries), same DMA + MXU work as the shipped kernel with the merge
    replaced by cheaper stand-ins. ``which``:
      'mm'       = matmul only (DMA + MXU floor at this block shape);
      'mask'     = + n_valid iota-row mask + broadcast select;
      'rowmax'   = mask + row-max (minimum any exact selection must pay);
      'prologue' = mask + row-max + row-argmax (the invariant merge's
                   unconditional per-tile prologue).
    kernel(5.13 ms) - prologue = while-loop insertion cost; prologue -
    rowmax = the argmax pass; mm - ceiling_dma = MXU + grid-shape tax.
    A numeric suffix overrides block_n (e.g. ``mm2048``)."""
    import re as _re

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bn = 6144
    m = _re.match(r"([a-z]+)(\d+)$", which)
    if m:
        which, bn = m.group(1), int(m.group(2))
    n, q, bq = 1_000_000, 64, 64
    npad = -(-n // bn) * bn

    def kern(q_ref, ct_ref, out_ref, acc):
        j = pl.program_id(0)
        i = pl.program_id(1)
        rows = pl.ds(i * bq, bq)

        @pl.when(j == 0)
        def _init():
            acc[rows] = jnp.zeros((bq, 1), jnp.float32)

        scores = jnp.dot(q_ref[:], ct_ref[:], preferred_element_type=jnp.float32)
        if which == "mm":
            acc[rows] = acc[rows] + scores[:, :1]
        else:
            col0 = j * bn
            iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
            scores = jnp.where((col0 + iota_row) < n, scores, T.NEG_INF)
            if which == "mask":
                acc[rows] = acc[rows] + scores[:, :1]
            elif which == "rowmax":
                acc[rows] = acc[rows] + jnp.max(scores, axis=-1, keepdims=True)
            else:  # prologue
                mx = jnp.max(scores, axis=-1, keepdims=True)
                am = jnp.argmax(scores, axis=-1).astype(jnp.float32)
                acc[rows] = acc[rows] + mx + am[:, None]

        @pl.when(j == pl.num_programs(0) - 1)
        def _flush():
            out_ref[:] = acc[rows]

    ct = jax.random.normal(jax.random.PRNGKey(0), (D, npad), jnp.bfloat16)
    qb = jax.random.normal(jax.random.PRNGKey(1), (q, D), jnp.bfloat16)
    np.asarray(ct[0, 0])

    def one(qq, c):
        return pl.pallas_call(
            kern,
            grid=(npad // bn, q // bq),
            in_specs=[
                pl.BlockSpec((bq, D), lambda j, i: (i, 0)),
                pl.BlockSpec((D, bn), lambda j, i: (0, j)),
            ],
            out_specs=pl.BlockSpec((bq, 1), lambda j, i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((q, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((q, 1), jnp.float32)],
        )(qq, c)

    @jax.jit
    def run(qs, c):
        def step(carry, _):
            return carry + one(qs, c)[0, 0], None
        acc, _ = jax.lax.scan(step, 0.0, jnp.arange(8))
        return acc

    _stage(f"ceiling_q64_{which}: compiling (bn={bn})")
    np.asarray(run(qb, ct))
    t0 = time.perf_counter()
    np.asarray(run(qb, ct))
    dt = (time.perf_counter() - t0) / 8
    line = f"ceiling_q64_{which} bf16 bn={bn} bq=64: {dt*1e3:.2f} ms/batch (Q=64)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def int8_quality(n: int, q: int = 64) -> None:
    """Round-3 verdict #4: int8-tier retrieval quality vs the f32-exact
    oracle AT SCALE, plus the f32 re-rank repair.

    Synthetic random normalized vectors are the PESSIMISTIC case: cosine
    scores concentrate in ~N(0, 1/sqrt(D)) so top-k margins at N=1e6+ are
    the tightest this corpus family can produce (order statistics of a
    million near-identical scores). Real embedding corpora (hashed or
    trained, both heavily clustered) have wider margins; this measures the
    lower bound. Reports:
      recall@10  — |int8 top-10 ∩ exact top-10| / 10, mean over queries;
      displ      — mean exact-score displacement sum(exact top-10 scores) -
                   sum(exact scores of int8's picks) (0 = no quality loss
                   even where ids differ);
      rr_recall  — recall@10 after f32 re-rank of the int8 top-64 (gather
                   64 corpus columns/query + one exact dot);
      rr_ms      — wall cost of the re-rank pass (gather + [q,64,D] einsum).
    """
    k, kr = 10, int(os.environ.get("RRK", "64"))  # RRK: repair-shortlist width
    _stage(f"int8_quality N={n} kr={kr}: gen corpus")

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (D, n), jnp.bfloat16)
        n2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return x * jax.lax.rsqrt(n2 + 1e-12)[None, :].astype(jnp.bfloat16)

    # HBM discipline at 10M: bf16 (7.7 GB) + int8 (3.8 GB) corpora plus the
    # oracle's score buffers exceed the 16 GB chip. Never hold both full
    # corpora across a kernel: oracle first (bf16 only), then quantize and
    # DROP the bf16, run the int8 tier, and REGENERATE the deterministic
    # bf16 corpus (same PRNGKey) for the final exact-score gather.
    ct = gen(jax.random.PRNGKey(0))
    np.asarray(ct[0, 0])
    qs = jax.random.normal(jax.random.PRNGKey(1), (q, D), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)

    _stage("int8_quality: exact oracle (f32-exact fused tier)")
    se, ie = T.cosine_topk_fused(qs, ct, k, precision="exact")
    se, ie = np.asarray(se), np.asarray(ie)
    _stage("int8_quality: quantize + drop bf16 corpus")
    c8, sc = quantize_corpus_t(ct)
    np.asarray(c8[0, 0])
    del ct
    _stage("int8_quality: int8 top-64")
    s8, i8 = T.cosine_topk_fused_int8(qs, c8, sc, kr)
    s8, i8 = np.asarray(s8), np.asarray(i8)

    # Exact f32 scores of the int8 candidates: gather kr columns per query
    # (q*kr indices — small enough to avoid the 10M-index gather pathology)
    # and one [q, kr, D] x [q, D] contraction at f32.
    # Production-realizable variant: rerank from the int8 corpus ITSELF
    # (dequantized columns x unquantized f32 query). Removes the query-side
    # quantization noise with ZERO extra HBM (at 10M the bf16 copy used by
    # exact_rerank doesn't exist in an int8 deployment); leaves only the
    # irreducible per-column corpus rounding.
    @jax.jit
    def int8_dequant_rerank(ids, qs, c8, sc):
        cols = jnp.take(c8, ids.reshape(-1), axis=1).astype(jnp.float32)
        cols = cols * jnp.take(sc[0], ids.reshape(-1))[None, :]
        cols = cols.reshape(D, q, kr)
        return jnp.einsum("qd,dqk->qk", qs, cols)

    t0 = time.perf_counter()
    d8_of_int8 = np.asarray(int8_dequant_rerank(jnp.asarray(i8), qs, c8, sc))
    rr8_ms_cold = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    d8_of_int8 = np.asarray(int8_dequant_rerank(jnp.asarray(i8), qs, c8, sc))
    rr8_ms = (time.perf_counter() - t0) * 1e3
    del c8, sc

    @jax.jit
    def exact_rerank(ids, qs, c):
        cols = jnp.take(c, ids.reshape(-1), axis=1)  # [D, q*kr] bf16
        cols = cols.reshape(D, q, kr).astype(jnp.float32)
        return jnp.einsum("qd,dqk->qk", qs, cols)

    _stage("int8_quality: regenerate bf16 corpus for the exact-score gather")
    ct = gen(jax.random.PRNGKey(0))  # deterministic: bit-identical corpus
    np.asarray(ct[0, 0])
    t0 = time.perf_counter()
    ex_of_int8 = np.asarray(exact_rerank(jnp.asarray(i8), qs, ct))
    rr_ms_cold = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    ex_of_int8 = np.asarray(exact_rerank(jnp.asarray(i8), qs, ct))
    rr_ms = (time.perf_counter() - t0) * 1e3

    recalls, rr_recalls, rr8_recalls, displ = [], [], [], []
    for r in range(q):
        exact_ids = set(ie[r].tolist())
        recalls.append(len(exact_ids & set(i8[r, :k].tolist())) / k)
        order = np.argsort(-ex_of_int8[r], kind="stable")
        rr_ids = i8[r][order[:k]]
        rr_recalls.append(len(exact_ids & set(rr_ids.tolist())) / k)
        order8 = np.argsort(-d8_of_int8[r], kind="stable")
        rr8_ids = i8[r][order8[:k]]
        rr8_recalls.append(len(exact_ids & set(rr8_ids.tolist())) / k)
        # i8 rows are int8-score-sorted, so columns :k are int8's top-10 picks.
        displ.append(float(se[r].sum() - ex_of_int8[r, :k].sum()))
    line = (
        f"int8_quality N={n} Q={q} kr={kr}: recall@10={np.mean(recalls):.4f} "
        f"displ={np.mean(displ):.2e} rr_recall@10={np.mean(rr_recalls):.4f} "
        f"rr8_recall@10={np.mean(rr8_recalls):.4f} "
        f"rr_ms={rr_ms:.2f} rr8_ms={rr8_ms:.2f} (cold {rr_ms_cold:.0f}/{rr8_ms_cold:.0f})"
    )
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


def main(name: str) -> None:
    global N
    if name == "adversarial_1m":
        _stage(f"start adversarial_1m backend={jax.default_backend()}")
        return adversarial_1m()
    if name == "ceiling_1m":
        _stage(f"start ceiling_1m backend={jax.default_backend()}")
        return ceiling_1m()
    if name.startswith("ceiling_q1024_"):
        _stage(f"start {name} backend={jax.default_backend()}")
        return ceiling_q1024(name[len("ceiling_q1024_"):])
    if name.startswith("ceiling_q64_"):
        _stage(f"start {name} backend={jax.default_backend()}")
        return ceiling_q64(name[len("ceiling_q64_"):])
    if name.startswith("int8_quality_"):
        _stage(f"start {name} backend={jax.default_backend()}")
        suffix = name[len("int8_quality_"):]
        qn = 64
        if "_q" in suffix:
            suffix, qs_ = suffix.split("_q")
            qn = int(qs_)
        scale = {"1m": 1_000_000, "10m": 10_000_000}[suffix]
        return int8_quality(scale, q=qn)
    if name == "ceiling_tiled_1m":
        _stage(f"start ceiling_tiled_1m backend={jax.default_backend()}")
        return ceiling_tiled_1m()
    if "ivf" in name:
        return ivf_probe(name)
    if name.startswith("ceiling_") and name.endswith("_1m"):
        which = name[len("ceiling_"):-len("_1m")]
        _stage(f"start {name} backend={jax.default_backend()}")
        return ceiling_parts_1m(which)
    if name == "graph_match_10m":
        _stage(f"start graph_match_10m backend={jax.default_backend()}")
        return graph_match_10m()
    if name == "graph_match_attrib":
        _stage(f"start graph_match_attrib backend={jax.default_backend()}")
        return graph_match_attrib()
    if name == "shardmap_attrib_1dev":
        _stage(f"start {name} backend={jax.default_backend()}")
        return shardmap_attrib_1dev()
    if name.startswith("shardmap"):
        _stage(f"start {name} backend={jax.default_backend()}")
        return shardmap_fused_1dev(tag=name)
    if name == "oracle_check":
        _stage(f"start oracle_check backend={jax.default_backend()}")
        return oracle_check()
    if name == "oracle_check_bigq":
        _stage(f"start oracle_check_bigq backend={jax.default_backend()}")
        return oracle_check_bigq()
    if name == "oracle_check_padded":
        _stage(f"start oracle_check_padded backend={jax.default_backend()}")
        return oracle_check(padded=True)
    if name == "noscan_1m":
        _stage(f"start noscan_1m backend={jax.default_backend()}")
        return noscan_1m()
    if name == "minilm_encode":
        _stage(f"start minilm_encode backend={jax.default_backend()}")
        return minilm_encode()
    spec = EXPERIMENTS[name]
    dtype, block_n, q = spec[:3]
    slice_n = spec[3] if len(spec) > 3 else 0
    variant = spec[4] if len(spec) > 4 else "invariant"
    block_q = spec[5] if len(spec) > 5 else 128
    if name.startswith("canary"):
        N = 65536
    elif name.startswith("tenm"):
        N = 10_000_000
    tiled = name.startswith(("bf16t", "int8t", "tenmt"))
    if name.startswith("tenmbig"):
        N = 10_000_000
    _stage(
        f"start {name} N={N} slice={slice_n} variant={variant} "
        f"backend={jax.default_backend()} device={_device_kind()}"
    )

    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (D, N), jnp.bfloat16)
        n2 = jnp.einsum("dn,dn->n", x, x, preferred_element_type=jnp.float32)
        return x * jax.lax.rsqrt(n2 + 1e-12)[None, :].astype(jnp.bfloat16)

    ct = gen(jax.random.PRNGKey(0))
    # Corpus tensors are explicit jit ARGUMENTS of `run` below — closing over
    # them would bake them into the HLO as constants and ship 768MB+ to the
    # remote compiler (the round-1 "tunnel hang": noscan_1m compiles in 2s,
    # the closure version never finishes).
    if dtype == "int8":
        c8, sc = quantize_corpus_t(ct)
        if tiled:
            c8 = T.tile_corpus_t(c8, block_n=block_n)
            sc = T.tile_scales(sc, block_n=block_n)
        operands = (c8, sc)
        inner = lambda qq, c, s: T.cosine_topk_fused_int8(
            qq, c, s, K, block_n=block_n, slice_n=slice_n, variant=variant,
            block_q=block_q,
        )
        np.asarray(c8[(0, 0, 0)] if tiled else c8[0, 0])
        del ct  # free the 7.7GB bf16 source at 10M before the timed runs
    else:
        if tiled:
            ct = T.tile_corpus_t(ct, block_n=block_n)
        operands = (ct,)
        inner = lambda qq, c: T.cosine_topk_fused(
            qq, c, K, precision="fast", block_n=block_n, slice_n=slice_n,
            variant=variant, block_q=block_q,
        )
        np.asarray(ct[(0, 0, 0)] if tiled else ct[0, 0])
    _stage("corpus generated + settled")

    R = 16
    keys = jax.random.split(jax.random.PRNGKey(1), R)
    qs = jax.vmap(lambda k: jax.random.normal(k, (q, D)))(keys)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)

    @jax.jit
    def run(qs, *corpus):
        def step(carry, qq):
            s, i = inner(qq, *corpus)
            return carry + s[0, 0] + i[0, 0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(step, 0.0, qs)
        return acc

    _stage("compiling + warmup")
    np.asarray(run(qs, *operands))
    _stage("warm; timing")
    t0 = time.perf_counter()
    np.asarray(run(qs, *operands))
    dt = (time.perf_counter() - t0) / R
    line = f"{name} N={N}: {dt * 1e3:.2f} ms/batch ({q / dt:,.0f} QPS)"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main(sys.argv[1])
