"""Golden parity: JAX HunyuanVideo VAE vs the reference (torch, CPU).

The reference's vendored vae.py needs diffusers; tests/diffusers_stub.py
provides faithful stand-ins (the only nontrivial one is the mid-block
Attention, implemented per diffusers semantics). Both sides run fp32."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from kandinsky5_tpu.checkpoint import convert_vae_state_dict
from kandinsky5_tpu.models.vae import HunyuanVideoVAE

from . import diffusers_stub
from .ref import load_reference_models


@pytest.fixture(scope="module")
def ref_vae():
    diffusers_stub.install()
    load_reference_models()  # registers the kandinsky.* packages
    import kandinsky.models.vae as rvae

    torch.manual_seed(0)
    vae = rvae.AutoencoderKLHunyuanVideo(
        in_channels=3, out_channels=3, latent_channels=16,
        block_out_channels=(128, 256, 512, 512), layers_per_block=2,
    )
    vae.eval()
    return rvae, vae


def _mine_from(vae, dtype=jnp.float32):
    sd = {k: v.detach().float().numpy() for k, v in vae.state_dict().items()}
    params = convert_vae_state_dict(sd, dtype=dtype)
    return HunyuanVideoVAE(params, dtype=dtype)


def _to_jax(x_torch):  # NCTHW -> NTHWC
    return jnp.asarray(x_torch.permute(0, 2, 3, 4, 1).numpy())


def _to_torch_layout(y_jax):  # NTHWC -> NCTHW numpy
    return np.asarray(y_jax).transpose(0, 4, 1, 2, 3)


def test_decode_parity_untiled(ref_vae):
    rvae, vae = ref_vae
    mine = _mine_from(vae)
    torch.manual_seed(1)
    z = torch.randn(1, 16, 3, 8, 8)
    with torch.no_grad():
        ref = vae.decode(z).sample.numpy()  # opt tiling -> untiled at this size
    out = _to_torch_layout(mine.decode(_to_jax(z)))
    assert out.shape == ref.shape == (1, 3, 9, 64, 64)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_encode_parity_untiled(ref_vae):
    rvae, vae = ref_vae
    mine = _mine_from(vae)
    torch.manual_seed(2)
    x = torch.randn(1, 3, 9, 64, 64)
    with torch.no_grad():
        ref = vae.encode(x).latent_dist.mode().numpy()
    out = _to_torch_layout(mine.encode(_to_jax(x)))
    assert out.shape == ref.shape == (1, 16, 3, 8, 8)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_decode_parity_tiled(ref_vae):
    """Force temporal+spatial tiling with small tiles and compare the
    full blend orchestration (reference vae.py:1012-1204)."""
    rvae, vae = ref_vae
    mine = _mine_from(vae)
    torch.manual_seed(3)
    z = torch.randn(1, 16, 5, 12, 12)

    tile, stride = (1, 9, 64, 64), (4, 32, 32)
    vae.apply_tiling(tile, stride)
    vae.tile_size = tile
    with torch.no_grad():
        ref = vae._decode(z).sample.numpy()

    mine._apply_tiling(tile[1:], stride)
    out = _to_torch_layout(mine.decode(_to_jax(z), opt_tiling=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


def test_encode_parity_tiled(ref_vae):
    rvae, vae = ref_vae
    mine = _mine_from(vae)
    torch.manual_seed(4)
    x = torch.randn(1, 3, 17, 96, 96)

    tile, stride = (1, 9, 64, 64), (4, 32, 32)
    vae.apply_tiling(tile, stride)
    vae.tile_size = tile
    with torch.no_grad():
        ref = vae._encode(x)
        ref = torch.chunk(ref, 2, dim=1)[0].numpy()  # mean half

    mine._apply_tiling(tile[1:], stride)
    out = _to_torch_layout(mine.encode(_to_jax(x), opt_tiling=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


def test_optimal_tiling_tables(ref_vae):
    """Tiling selection must match the reference lookup
    (vae.py:1245-1273)."""
    rvae, vae = ref_vae
    mine = _mine_from(vae)
    for shape in [(1, 16, 31, 64, 96),   # 5s 768x512
                  (1, 16, 61, 64, 96),   # 10s
                  (1, 16, 3, 8, 8)]:
        ref_tile, ref_stride = vae.get_dec_optimal_tiling(list(shape))
        f = 4 * (shape[2] - 1) + 1
        tile, stride = mine._optimal_tiling(f, 8 * shape[3], 8 * shape[4])
        assert tuple(ref_tile[1:]) == tuple(tile)
        assert tuple(ref_stride) == tuple(stride)


def test_round_trip_reconstruction(ref_vae):
    """encode->decode on smooth input roughly reconstructs (sanity that
    the two towers are consistent; random weights so loose)."""
    rvae, vae = ref_vae
    mine = _mine_from(vae)
    t = np.linspace(0, 1, 9)[None, :, None, None, None]
    h = np.linspace(0, 1, 64)[None, None, :, None, None]
    x = jnp.asarray(np.broadcast_to(0.3 * t + 0.2 * h, (1, 9, 64, 64, 3)),
                    jnp.float32)
    z = mine.encode(x)
    y = mine.decode(z)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
