"""On-chip validation of the Cout-blocked Pallas conv at every dominant
decoder shape (r4: kernel extended from C in {128,256} to {128,256,512}
via Cout blocking so the WHOLE decode tower can run Pallas — the r4
chain experiment measured back-to-back Pallas at 101.5 TFLOP/s vs XLA
68.8 vs a MIXED chain 53.5, i.e. mixing is what regressed round 3).

Per shape: correctness vs the XLA reference conv (bf16 tolerance) and
steady TFLOP/s for both lowerings.

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_conv_pallas_all.py
"""
import os
import time

import jax
import jax.numpy as jnp

from kandinsky5_tpu.models.vae import causal_conv3d
from kandinsky5_tpu.ops.conv_pallas import (
    _pick_tiles,
    causal_conv3d_fused,
    conv_pallas_supported,
)

SHAPES = [
    (13, 512, 768, 256, 128),
    (13, 512, 768, 128, 128),
    (7, 256, 384, 512, 256),
    (7, 256, 384, 256, 256),
    (4, 128, 192, 512, 512),
    (4, 64, 96, 512, 512),
]


def _sync(y):
    return float(jnp.sum(y[0, 0, 0, :1].astype(jnp.float32)))


def main():
    print(f"devices: {jax.devices()}")
    for t, h, w, cin, cout in SHAPES:
        # generate on-device: shipping a ~2.6 GB host array through the
        # axon tunnel dominates the whole sweep otherwise
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = (jax.random.normal(ks[0], (1, t, h, w, cin), jnp.bfloat16)
             * 0.2).block_until_ready()
        p = {
            "weight": jax.random.normal(ks[1], (3, 3, 3, cin, cout),
                                        jnp.bfloat16) * 0.02,
            "bias": jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1,
        }
        assert conv_pallas_supported(x, p["weight"], (1, 1, 1)), (t, h, w)
        bw, cb = _pick_tiles(w, cin, cout)
        flops = 2 * t * h * w * cin * cout * 27

        def _xla_conv(p, x):
            # causal_conv3d defaults to the Pallas tower on TPU (r4);
            # pin the opt-out at TRACE time so this column stays XLA
            os.environ["KANDINSKY5_TPU_PALLAS_CONV"] = "0"
            try:
                return causal_conv3d(p, x)
            finally:
                del os.environ["KANDINSKY5_TPU_PALLAS_CONV"]

        fx = jax.jit(_xla_conv)
        fp = jax.jit(lambda p, x: causal_conv3d_fused(p, x))
        fq = jax.jit(lambda p, x: causal_conv3d_fused(p, x, quant=True))

        # jitted fused reductions: the eager version materializes fp32
        # casts + sub/abs temporaries (~3.4 GB each at the largest
        # shape) and OOMs HBM once three outputs are alive
        merr = jax.jit(lambda a, b: jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        mabs = jax.jit(lambda a: jnp.max(jnp.abs(a.astype(jnp.float32))))

        yx = fx(p, x)
        ref = float(mabs(yx)) + 1e-6
        yp = fp(p, x)
        err = float(merr(yx, yp))
        del yp
        yq = fq(p, x)
        errq = float(merr(yx, yq))
        del yq, yx

        rates = []
        for f in (fx, fp, fq):
            _sync(f(p, x))
            n = 6
            t0 = time.perf_counter()
            y = None
            for _ in range(n):
                y = f(p, x)
            _sync(y)
            rates.append(flops / ((time.perf_counter() - t0) / n) / 1e12)

        print(f"({t:3d},{h:4d},{w:4d},{cin:4d}->{cout:4d}) bw={bw:4d} "
              f"cb={cb:4d}  xla {rates[0]:6.1f}  pallas {rates[1]:6.1f} "
              f"int8 {rates[2]:6.1f} TFLOP/s  maxerr {err:.4f} "
              f"(relmax {err / ref:.4f})  int8 relmax {errq / ref:.4f}")


if __name__ == "__main__":
    main()
