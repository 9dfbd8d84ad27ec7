"""Quality metrics for parity gates (BASELINE.md: decoded-frame
PSNR > 35 dB vs the PyTorch reference; latents within tolerance)."""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB between two frame arrays."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(max_val) - 10.0 * np.log10(mse))


def latent_stats(a: np.ndarray, b: np.ndarray) -> dict:
    """Comparison summary for sampled latents."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    diff = np.abs(a - b)
    denom = np.maximum(np.abs(b), 1e-6)
    return {
        "max_abs": float(diff.max()),
        "mean_abs": float(diff.mean()),
        "rel_mean": float((diff / denom).mean()),
        "cosine": float(
            (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)),
    }
