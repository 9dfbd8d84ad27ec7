"""On-chip validation of the Cout-blocked Pallas conv at every dominant
decoder shape (r4: kernel extended from C in {128,256} to {128,256,512}
via Cout blocking so the WHOLE decode tower can run Pallas — the r4
chain experiment measured back-to-back Pallas at 101.5 TFLOP/s vs XLA
68.8 vs a MIXED chain 53.5, i.e. mixing is what regressed round 3).

Per shape: correctness vs the XLA reference conv (bf16 tolerance) and
steady TFLOP/s for both lowerings.

Run: PYTHONPATH=.:/root/.axon_site python tools/bench_conv_pallas_all.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

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
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, t, h, w, cin) * 0.2, jnp.bfloat16)
        p = {
            "weight": jnp.asarray(rs.randn(3, 3, 3, cin, cout) * 0.02,
                                  jnp.bfloat16),
            "bias": jnp.asarray(rs.randn(cout) * 0.1, jnp.float32),
        }
        assert conv_pallas_supported(x, p["weight"], (1, 1, 1)), (t, h, w)
        bw, cb = _pick_tiles(w, cin, cout)
        flops = 2 * t * h * w * cin * cout * 27

        fx = jax.jit(lambda p, x: causal_conv3d(p, x))
        fp = jax.jit(lambda p, x: causal_conv3d_fused(p, x))

        yx = fx(p, x)
        yp = fp(p, x)
        err = float(jnp.max(jnp.abs(yx.astype(jnp.float32)
                                    - yp.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(yx.astype(jnp.float32)))) + 1e-6

        rates = []
        for f in (fx, fp):
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
              f"TFLOP/s  maxerr {err:.4f} (relmax {err / ref:.4f})")


if __name__ == "__main__":
    main()
