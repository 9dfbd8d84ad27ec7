"""Mesh-parallel (dp-batched) temporal tile decode == sequential decode."""

import numpy as np

import jax
import jax.numpy as jnp

from kandinsky5_tpu.models.vae import HunyuanVideoVAE, init_vae_params
from kandinsky5_tpu.parallel.sharding import make_mesh


def test_mesh_tiled_decode_matches_sequential():
    params = init_vae_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 8, 8, 16), jnp.float32)

    seq = HunyuanVideoVAE(params, dtype=jnp.float32)
    seq._apply_tiling((9, 64, 64), (4, 32, 32))
    out_seq = seq.decode(z, opt_tiling=False)

    mesh = make_mesh(dp=len(jax.devices()))
    par = HunyuanVideoVAE(params, dtype=jnp.float32, mesh=mesh)
    par._apply_tiling((9, 64, 64), (4, 32, 32))
    out_par = par.decode(z, opt_tiling=False)

    assert out_seq.shape == out_par.shape
    np.testing.assert_allclose(np.asarray(out_par), np.asarray(out_seq),
                               rtol=2e-5, atol=2e-5)


def test_mesh_spatial_tiled_decode_matches_sequential():
    """dp-batched SPATIAL tiles (one sharded decode of all equal-shaped
    tiles) == the sequential per-tile loop, blending included."""
    params = init_vae_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 16, 16, 16),
                          jnp.float32)

    seq = HunyuanVideoVAE(params, dtype=jnp.float32)
    seq._apply_tiling((5, 64, 64), (5, 32, 32))
    out_seq = seq.decode(z, opt_tiling=False)

    mesh = make_mesh(dp=len(jax.devices()))
    par = HunyuanVideoVAE(params, dtype=jnp.float32, mesh=mesh)
    par._apply_tiling((5, 64, 64), (5, 32, 32))
    out_par = par.decode(z, opt_tiling=False)

    assert out_seq.shape == out_par.shape
    np.testing.assert_allclose(np.asarray(out_par), np.asarray(out_seq),
                               rtol=2e-5, atol=2e-5)
