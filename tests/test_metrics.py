import numpy as np

from kandinsky5_tpu.utils.metrics import latent_stats, psnr


def test_psnr():
    a = np.zeros((4, 8, 8, 3))
    assert psnr(a, a) == float("inf")
    b = a + 1.0
    assert abs(psnr(a, b, max_val=255.0) - 48.13) < 0.01
    noisy = a + np.random.RandomState(0).randn(*a.shape)
    assert 40 < psnr(a, noisy) < 55


def test_latent_stats():
    rng = np.random.RandomState(1)
    x = rng.randn(100)
    s = latent_stats(x, x)
    assert s["max_abs"] == 0.0 and abs(s["cosine"] - 1.0) < 1e-9
