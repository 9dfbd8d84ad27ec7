"""Probe: raw matmul rate at s8xs8->s32 vs bf16xbf16->f32 on v5e.

Decides whether a SageAttention-style int8-QK flash variant is worth
building: the v5e MXU lists int8 at 2x the bf16 rate (394 vs 197
TOP/s), but the XLA conv lowering only realized 1.24x
(tools/bench_int8conv.py). Measures both the Pallas dot_general
lowering (a K-gridded tiled matmul, unique data per step so nothing
can be CSE'd) and the plain-XLA jnp.matmul lowering.

    timeout 1200 python tools/bench_int8mm.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "bn"))
def mm_pallas(a, b, bm, bk, bn):
    m, k = a.shape
    _, n = b.shape
    acc_dt = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=k // bk),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), acc_dt),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
    )(a, b)


@jax.jit
def mm_xla(a, b):
    acc_dt = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dt)


def sync(x):
    # device->host scalar read: forces completion (block_until_ready is
    # unreliable through the axon tunnel)
    return float(jnp.sum(x[:1, :1].astype(jnp.float32)))


def timeit(f, *args, reps=3, inner=20, **kw):
    """Dispatch `inner` async calls per sync: amortizes the ~30 ms
    tunnel roundtrip; returns per-call seconds."""
    sync(f(*args, **kw))
    # measured empty-queue roundtrip to subtract
    r = f(*args, **kw)
    t0 = time.perf_counter()
    sync(r)
    rt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = f(*args, **kw)
        sync(r)
        best = min(best, time.perf_counter() - t0 - rt)
    return best / inner


def run(m, k, n, bm, bk, bn):
    key = jax.random.PRNGKey(0)
    af = jax.random.normal(key, (m, k), jnp.float32)
    bf = jax.random.normal(key, (k, n), jnp.float32)
    flops = 2 * m * k * n
    for name, a, b in [
        ("bf16", af.astype(jnp.bfloat16), bf.astype(jnp.bfloat16)),
        ("int8", (af * 10).astype(jnp.int8), (bf * 10).astype(jnp.int8)),
    ]:
        for how, fn, kw in [("pallas", mm_pallas,
                             dict(bm=bm, bk=bk, bn=bn)),
                            ("xla", mm_xla, {})]:
            try:
                t = timeit(fn, a, b, **kw)
                print(f"  ({m},{k},{n}) {name}/{how}: {t*1e3:8.3f} ms  "
                      f"{flops/t/1e12:7.1f} T/s")
            except Exception as e:
                print(f"  ({m},{k},{n}) {name}/{how}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    run(8192, 8192, 8192, 512, 1024, 512)
