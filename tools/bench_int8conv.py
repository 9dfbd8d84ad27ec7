"""Feasibility probe: int8 3D conv on the v5e MXU vs bf16.

A representative VAE decoder conv: (1, 16, 512, 768, 128) x (3,3,3,128,128).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x[0, 0, 0, :1, :1].astype(jnp.float32)))


def main():
    rng = np.random.RandomState(0)
    T, H, W, C = 16, 512, 768, 128
    x8 = jnp.asarray(rng.randint(-127, 127, (1, T, H, W, C)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 127, (3, 3, 3, C, C)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    flops = 2 * T * H * W * C * C * 27

    @jax.jit
    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32)

    @jax.jit
    def conv_bf(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    for name, f, a, b in (("bf16", conv_bf, xb, wb),
                          ("int8", conv_i8, x8, w8)):
        try:
            t0 = time.perf_counter()
            sync(f(a, b))
            c = time.perf_counter() - t0
            t0 = time.perf_counter()
            sync(f(a, b))
            t = time.perf_counter() - t0
            print(f"{name}: compile+first {c:.1f}s steady {t * 1e3:.0f} ms "
                  f"{flops / t / 1e12:.1f} TFLOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:200], flush=True)


if __name__ == "__main__":
    main()
