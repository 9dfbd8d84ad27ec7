"""Pallas kernel logic on CPU via interpret mode — CI coverage of the
TPU kernels without TPU hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kandinsky5_tpu.ops.attention import dense_attention
from kandinsky5_tpu.ops.flash_pallas import flash_attention
from kandinsky5_tpu.ops.nabla import (
    block_mask_to_kv_lists,
    group_union_mask,
    masked_block_attention_xla,
    nabla_block_mask,
    sta_mask,
)
from kandinsky5_tpu.ops.sparse_pallas import sparse_attention


def _qkv(key, b, l, h, d):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, l, h, d), jnp.float32) for k in ks)


def test_flash_interpret_matches_dense():
    q, k, v = _qkv(jax.random.PRNGKey(0), 1, 1024, 2, 64)
    out = flash_attention(q, k, v, interpret=True)
    ref = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_interpret_int8_qk():
    """SageAttention-style int8 QK path: quantization error stays small
    for QK-RMSNorm'd inputs (the DiT's attention regime), mask honored."""
    q, k, v = _qkv(jax.random.PRNGKey(7), 2, 512, 2, 64)
    q = q / jnp.sqrt(jnp.mean(jnp.square(q), axis=-1, keepdims=True))
    k = k / jnp.sqrt(jnp.mean(jnp.square(k), axis=-1, keepdims=True))
    ref = dense_attention(q, k, v)
    out = flash_attention(q, k, v, qk_int8=True, interpret=True)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 2e-2
    # masked padded keys stay masked through the quantized path
    mask = jnp.arange(512)[None, :] < jnp.array([[300], [100]])
    refm = dense_attention(q, k, v, kv_mask=mask)
    outm = flash_attention(q, k, v, kv_mask=mask, qk_int8=True,
                           interpret=True)
    assert np.max(np.abs(np.asarray(outm) - np.asarray(refm))) < 2e-2


def test_flash_interpret_int8_qk_fast_exp():
    """int8-QK with the fused Schraudolph exp2 (opt-in; a measured perf
    negative on v5e — see flash_pallas docstring): +-3% per softmax
    weight, mean bias cancelled by the in-kernel normalizer; masked
    keys map to the inert 2^-126 weight, not garbage."""
    q, k, v = _qkv(jax.random.PRNGKey(11), 2, 512, 2, 64)
    q = q / jnp.sqrt(jnp.mean(jnp.square(q), axis=-1, keepdims=True))
    k = k / jnp.sqrt(jnp.mean(jnp.square(k), axis=-1, keepdims=True))
    ref = dense_attention(q, k, v)
    out = flash_attention(q, k, v, qk_int8=True, fast_exp=True,
                          interpret=True)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 4e-2
    mask = jnp.arange(512)[None, :] < jnp.array([[300], [100]])
    refm = dense_attention(q, k, v, kv_mask=mask)
    outm = flash_attention(q, k, v, kv_mask=mask, qk_int8=True,
                           fast_exp=True, interpret=True)
    assert np.max(np.abs(np.asarray(outm) - np.asarray(refm))) < 4e-2


def test_flash_interpret_int8_qk_exp_bf16():
    """int8-QK with the bf16 exp2 epilogue (the VPU-bound kernel's
    cheaper softmax pass): error stays bounded, masks hold."""
    q, k, v = _qkv(jax.random.PRNGKey(11), 2, 512, 2, 64)
    q = q / jnp.sqrt(jnp.mean(jnp.square(q), axis=-1, keepdims=True))
    k = k / jnp.sqrt(jnp.mean(jnp.square(k), axis=-1, keepdims=True))
    ref = dense_attention(q, k, v)
    out = flash_attention(q, k, v, qk_int8=True, exp_bf16=True,
                          interpret=True)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 3e-2
    mask = jnp.arange(512)[None, :] < jnp.array([[300], [100]])
    refm = dense_attention(q, k, v, kv_mask=mask)
    outm = flash_attention(q, k, v, kv_mask=mask, qk_int8=True,
                           exp_bf16=True, interpret=True)
    assert np.max(np.abs(np.asarray(outm) - np.asarray(refm))) < 3e-2


def test_flash_interpret_int8_pv():
    """int8-PV mode (opt-in; a measured perf negative on v5e — kept for
    MXU-bound shapes): per-row log2-domain P scales keep diffuse rows
    accurate, per-channel V scales bound the output error, masks hold."""
    q, k, v = _qkv(jax.random.PRNGKey(9), 2, 512, 2, 64)
    q = q / jnp.sqrt(jnp.mean(jnp.square(q), axis=-1, keepdims=True))
    k = k / jnp.sqrt(jnp.mean(jnp.square(k), axis=-1, keepdims=True))
    ref = dense_attention(q, k, v)
    out = flash_attention(q, k, v, pv_int8=True, interpret=True)
    assert np.max(np.abs(np.asarray(out) - np.asarray(ref))) < 4e-2
    mask = jnp.arange(512)[None, :] < jnp.array([[300], [100]])
    refm = dense_attention(q, k, v, kv_mask=mask)
    outm = flash_attention(q, k, v, kv_mask=mask, pv_int8=True,
                           interpret=True)
    assert np.max(np.abs(np.asarray(outm) - np.asarray(refm))) < 4e-2


def test_flash_interpret_int8_pipe_exact():
    """Lag-1 kv-block pipelined int8 kernel (opt-in; a measured perf
    negative on v5e — see flash_pallas docstring): identical math and
    accumulation order to the plain int8 kernel, so fp32-scratch mode
    must match it BIT-EXACTLY across block shapes, masking, and the
    odd/even drain parities; bf16 scratch (exp_bf16) stays within the
    softmax-weight rounding bound."""
    q, k, v = _qkv(jax.random.PRNGKey(13), 2, 640, 2, 64)
    q = q / jnp.sqrt(jnp.mean(jnp.square(q), axis=-1, keepdims=True))
    k = k / jnp.sqrt(jnp.mean(jnp.square(k), axis=-1, keepdims=True))
    mask = jnp.arange(640)[None, :] < jnp.array([[600], [128]])
    for bq, bk in ((256, 128), (640, 256), (128, 640)):
        for m in (None, mask):
            base = flash_attention(q, k, v, kv_mask=m, qk_int8=True,
                                   pipe=False, block_q=bq, block_k=bk,
                                   interpret=True)
            out = flash_attention(q, k, v, kv_mask=m, qk_int8=True,
                                  pipe=True, block_q=bq, block_k=bk,
                                  interpret=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
            outb = flash_attention(q, k, v, kv_mask=m, qk_int8=True,
                                   pipe=True, exp_bf16=True, block_q=bq,
                                   block_k=bk, interpret=True)
            assert np.max(np.abs(np.asarray(outb, np.float32)
                                 - np.asarray(base, np.float32))) < 2e-2


def test_flash_interpret_kv_mask():
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 512, 2, 64)
    mask = jnp.arange(512)[None, :] < jnp.array([[300], [100]])
    out = flash_attention(q, k, v, kv_mask=mask, interpret=True)
    ref = dense_attention(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sparse_interpret_exact_and_banked():
    key = jax.random.PRNGKey(2)
    s1 = 16
    q, k, v = _qkv(key, 1, s1 * 64, 2, 64)
    sta = jnp.asarray(sta_mask(4, 2, 2, 3, 3, 3))
    mask = nabla_block_mask(q, k, sta, thr=0.5, method="sort")
    ki, kn = block_mask_to_kv_lists(mask)
    out = sparse_attention(q, k, v, ki, kn, q_rows=1, interpret=True)
    ref = masked_block_attention_xla(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    gmask = group_union_mask(mask, 8)
    gi, gn = block_mask_to_kv_lists(gmask)
    out8 = sparse_attention(q, k, v, gi, gn, q_rows=8, interpret=True)
    ref8 = masked_block_attention_xla(q, k, v, jnp.repeat(gmask, 8, axis=2))
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8),
                               rtol=2e-5, atol=2e-5)


def test_conv_pallas_interpret_plain_and_fused():
    """Implicit-GEMM causal conv (opt-in kernel) == XLA causal conv,
    plain and with the folded-GroupNorm+SiLU prologue."""
    from kandinsky5_tpu.models.vae import causal_conv3d, group_norm, _gn_fold
    from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    B, T, H, W, C = 1, 3, 16, 128, 128
    x = jax.random.normal(ks[0], (B, T, H, W, C), jnp.float32)
    p = {"weight": jax.random.normal(ks[1], (3, 3, 3, C, C),
                                     jnp.float32) * 0.05,
         "bias": jax.random.normal(ks[2], (C,), jnp.float32)}

    ref = causal_conv3d(p, x)
    out = causal_conv3d_fused(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    gnp = {"weight": jnp.full((C,), 1.3, jnp.float32),
           "bias": jnp.full((C,), 0.1, jnp.float32)}
    h = group_norm(gnp, x)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    ref2 = causal_conv3d(p, h)
    scale, shift = _gn_fold(gnp, x)
    out2 = causal_conv3d_fused(p, x, scale=scale[0], shift=shift[0],
                               act=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)


def test_sparse_interpret_paged_kv():
    """kv_page_blocks=2 (128-token DMA pages) == XLA attention under the
    page-unioned mask."""
    key = jax.random.PRNGKey(3)
    s1 = 16
    q, k, v = _qkv(key, 1, s1 * 64, 2, 64)
    sta = jnp.asarray(sta_mask(4, 2, 2, 3, 3, 3))
    mask = nabla_block_mask(q, k, sta, thr=0.5, method="sort")
    gmask = group_union_mask(mask, 8)
    b, h, rows, _ = gmask.shape
    pmask = gmask.reshape(b, h, rows, s1 // 2, 2).any(axis=-1)
    pi, pn = block_mask_to_kv_lists(pmask)
    out = sparse_attention(q, k, v, pi, pn, q_rows=8, kv_page_blocks=2,
                           interpret=True)
    # expand the page mask back to 64-block columns, then to q rows
    expanded = jnp.repeat(jnp.repeat(pmask, 2, axis=3), 8, axis=2)
    ref = masked_block_attention_xla(q, k, v, expanded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_pallas_interpret_cout_blocked():
    """The Cout-blocked kernel extension (r4: C in {128,256,512} so the
    WHOLE decoder tower can run Pallas — mixing Pallas and XLA convs
    measured slower than either pure chain): a 256->512 conv runs the
    2-D (spatial, cout-block) grid; output must equal the XLA conv."""
    from kandinsky5_tpu.models.vae import causal_conv3d
    from kandinsky5_tpu.ops.conv_pallas import (
        _pick_tiles,
        causal_conv3d_fused,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    B, T, H, W, Cin, Cout = 1, 2, 8, 64, 256, 512
    bw, cb = _pick_tiles(W, Cin, Cout)
    assert cb < Cout, "shape must exercise Cout blocking"
    x = jax.random.normal(ks[0], (B, T, H, W, Cin), jnp.float32) * 0.2
    p = {"weight": jax.random.normal(ks[1], (3, 3, 3, Cin, Cout),
                                     jnp.float32) * 0.03,
         "bias": jax.random.normal(ks[2], (Cout,), jnp.float32)}
    ref = causal_conv3d(p, x)
    out = causal_conv3d_fused(p, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_pallas_interpret_stream_prefix_planes():
    """Streaming fused GN+SiLU (r4): the kernel's prefix_planes leaves
    the carried-history planes untransformed while the chunk frames get
    the folded scale/shift + SiLU — output must equal the unfused
    stream conv applied to the pre-transformed chunk."""
    from kandinsky5_tpu.models.vae import _gn_fold, group_norm
    from kandinsky5_tpu.models.vae_stream import conv3d_stream
    from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    B, T, H, W, C = 1, 3, 8, 64, 128
    x = jax.random.normal(ks[0], (B, T, H, W, C), jnp.float32) * 0.3
    hist = jax.random.normal(ks[1], (B, 2, H, W, C), jnp.float32) * 0.3
    p = {"weight": jax.random.normal(ks[2], (3, 3, 3, C, C),
                                     jnp.float32) * 0.05,
         "bias": jax.random.normal(ks[3], (C,), jnp.float32)}
    gnp = {"weight": jnp.full((C,), 1.2, jnp.float32),
           "bias": jnp.full((C,), -0.05, jnp.float32)}

    h = group_norm(gnp, x)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    ref, _ = conv3d_stream(p, h, hist)  # CPU -> XLA branch

    scale, shift = _gn_fold(gnp, x)
    xt = jnp.concatenate([hist, x], axis=1)
    out = causal_conv3d_fused(p, xt, scale=scale[0], shift=shift[0],
                              act=True, time_padded=True, prefix_planes=2,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_stream_fused_resnet_matches_unfused(monkeypatch):
    """The stream decoder's fused path end-to-end (resnet_stream with
    the Pallas tower forced on, interpret mode): per-chunk outputs AND
    carried state must match the unfused XLA stream across a 3-chunk
    sequence, including a final 1-frame chunk (the carried tail then
    reaches into the previous history)."""
    import functools

    from kandinsky5_tpu.models import vae as vae_mod
    from kandinsky5_tpu.models import vae_stream
    from kandinsky5_tpu.ops import conv_pallas

    ks = jax.random.split(jax.random.PRNGKey(13), 8)
    C = 128
    p = {
        "norm1": {"weight": 1.0 + 0.1 * jax.random.normal(ks[0], (C,)),
                  "bias": 0.1 * jax.random.normal(ks[1], (C,))},
        "conv1": {"weight": jax.random.normal(
            ks[2], (3, 3, 3, C, C), jnp.float32) * 0.05,
            "bias": 0.02 * jax.random.normal(ks[3], (C,))},
        "norm2": {"weight": 1.0 + 0.1 * jax.random.normal(ks[4], (C,)),
                  "bias": 0.1 * jax.random.normal(ks[5], (C,))},
        "conv2": {"weight": jax.random.normal(
            ks[6], (3, 3, 3, C, C), jnp.float32) * 0.05,
            "bias": 0.02 * jax.random.normal(ks[7], (C,))},
    }
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 6, 8, 64, C),
                          jnp.float32) * 0.3
    chunks = [x[:, :2], x[:, 2:5], x[:, 5:6]]

    st = None
    ref_outs = []
    for ch in chunks:
        y, st = vae_stream.resnet_stream(p, ch, st)
        ref_outs.append(y)

    monkeypatch.setattr(vae_mod, "_conv_pallas_on", lambda pp, xx: True)
    monkeypatch.setattr(vae_mod, "_fuse_gn_on", lambda default=None: True)
    monkeypatch.setattr(
        conv_pallas, "causal_conv3d_fused",
        functools.partial(conv_pallas.causal_conv3d_fused, interpret=True))
    st = None
    for ch, ref in zip(chunks, ref_outs):
        y, st = vae_stream.resnet_stream(p, ch, st)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_conv_pallas_interpret_int8_exact():
    """W8A8 conv path (r4): single halo tile (one program), so the
    in-kernel per-tile activation scale is reproducible outside — the
    int8 kernel must match an EXACT int32 emulation of the same
    quantization (both epilogues are one f32 multiply)."""
    from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    T, H, W, C = 1, 8, 64, 128
    x = jax.random.normal(ks[0], (1, T, H, W, C), jnp.float32) * 0.4
    p = {"weight": jax.random.normal(ks[1], (3, 3, 3, C, C),
                                     jnp.float32) * 0.05,
         "bias": jax.random.normal(ks[2], (C,), jnp.float32)}

    out = causal_conv3d_fused(p, x, quant=True, interpret=True)

    # exact emulation: same padding, same symmetric scales, s32 matmuls
    x_pad = jnp.pad(x[0], ((2, 0), (1, 1), (1, 7), (0, 0)), mode="edge")
    w27 = p["weight"].reshape(27, C, C)
    ws = jnp.maximum(jnp.max(jnp.abs(w27), axis=(0, 1)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w27 / ws), -127, 127).astype(jnp.int8)
    s = jnp.maximum(jnp.max(jnp.abs(x_pad)), 1e-8) / 127.0
    q = jnp.round(x_pad / s).astype(jnp.int8)
    acc = jnp.zeros((H * W, C), jnp.int32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                a = q[dt, dh:dh + H, dw:dw + W, :].reshape(H * W, C)
                acc += jax.lax.dot_general(
                    a, wq[dt * 9 + dh * 3 + dw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
    ref = (acc.astype(jnp.float32) * (s * ws) + p["bias"]).reshape(
        1, T, H, W, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and the quantization itself is sane vs the fp32 kernel
    outf = causal_conv3d_fused(p, x, interpret=True)
    rel = float(jnp.max(jnp.abs(out - outf))
                / (jnp.max(jnp.abs(outf)) + 1e-6))
    assert rel < 0.05, rel


def test_conv_pallas_interpret_int8_multitile_fused():
    """int8 + fused GN/SiLU across MULTIPLE halo tiles (each program
    quantizes with its own scale) — exact emulation per (t, h-block)
    window, transform applied before quantization like the kernel."""
    from kandinsky5_tpu.ops.conv_pallas import causal_conv3d_fused

    ks = jax.random.split(jax.random.PRNGKey(22), 5)
    T, H, W, C = 2, 16, 64, 128
    BH = 8
    x = jax.random.normal(ks[0], (1, T, H, W, C), jnp.float32) * 0.4
    p = {"weight": jax.random.normal(ks[1], (3, 3, 3, C, C),
                                     jnp.float32) * 0.05,
         "bias": jax.random.normal(ks[2], (C,), jnp.float32)}
    scale = 1.0 + 0.2 * jax.random.normal(ks[3], (C,))
    shift = 0.1 * jax.random.normal(ks[4], (C,))

    # bh pinned: the exact emulation below partitions activations into
    # 8-row halo tiles, and the per-tile quantization scale depends on
    # that partition (the production default is now auto-picked, 16
    # where VMEM fits — conv_pallas._auto_bh)
    out = causal_conv3d_fused(p, x, scale=scale, shift=shift, act=True,
                              quant=True, bh=BH, interpret=True)

    x_pad = jnp.pad(x[0], ((2, 0), (1, 1), (1, 7), (0, 0)), mode="edge")
    xf = x_pad.astype(jnp.float32) * scale + shift
    xt = xf * jax.nn.sigmoid(xf)
    w27 = p["weight"].reshape(27, C, C)
    ws = jnp.maximum(jnp.max(jnp.abs(w27), axis=(0, 1)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w27 / ws), -127, 127).astype(jnp.int8)
    tiles = []
    for t in range(T):
        row = []
        for hb in range(H // BH):
            win = xt[t:t + 3, hb * BH:hb * BH + BH + 2, :, :]
            s = jnp.maximum(jnp.max(jnp.abs(win)), 1e-8) / 127.0
            q = jnp.round(win / s).astype(jnp.int8)
            acc = jnp.zeros((BH * W, C), jnp.int32)
            for dt in range(3):
                for dh in range(3):
                    for dw in range(3):
                        a = q[dt, dh:dh + BH, dw:dw + W, :].reshape(
                            BH * W, C)
                        acc += jax.lax.dot_general(
                            a, wq[dt * 9 + dh * 3 + dw],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
            row.append((acc.astype(jnp.float32) * (s * ws)
                        + p["bias"]).reshape(BH, W, C))
        tiles.append(jnp.concatenate(row, axis=0))
    ref = jnp.stack(tiles)[None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
