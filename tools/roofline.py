"""Speed-of-light roofline for every pipeline stage on one v5e chip.

Analytic FLOP and HBM-byte counts for the 5s distill workload (768x512,
121 frames, 16 NFE) against v5e peaks, compared with the measured times
in BENCH_EXTRA.json. The point: show exactly how far each stage is from
its hardware floor, and WHICH wall (MXU or HBM) each stage stands
against. Reference workload: /root/reference README.md:60-69 protocol.

v5e (public spec): 197 bf16 TFLOP/s, 394 int8 TOP/s, 819 GB/s HBM.
The MXU contracts 128-wide lanes regardless of head_dim, so d=64
attention has a useful-FLOP ceiling of peak/2 (ops/flash_pallas.py).

Run: PYTHONPATH=. python tools/roofline.py [--json]
"""
import argparse
import json
import os

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM_BW = 819e9

# 5s distill workload
T_LAT, H_LAT, W_LAT = 31, 64, 96          # latent grid (121 frames, 512x768)
PATCH = (1, 2, 2)
S_VIS = T_LAT * (H_LAT // 2) * (W_LAT // 2)   # 47616 visual tokens
S_TXT = 256
D_MODEL, FF, HEADS, HD, BLOCKS = 1792, 7168, 28, 64, 32
NFE = 16
FRAMES, H_PIX, W_PIX = 121, 512, 768


def denoise_rooflines():
    s = S_VIS + 0  # self-attention runs over visual tokens
    # attention: QK^T + PV, both 2*S^2*d per head
    att_flops = BLOCKS * 4 * s * s * HD * HEADS
    # projections: self qkv+out (4*D^2), cross q/out on S + kv on S_txt,
    # FF in+out (2*D*FF); all x2 flops/MAC
    lin_flops = BLOCKS * 2 * (
        s * (4 * D_MODEL * D_MODEL)                      # self qkv + out
        + s * (2 * D_MODEL * D_MODEL) + S_TXT * 2 * D_MODEL * D_MODEL
        + s * 2 * D_MODEL * FF)                          # ff in + out
    # d=64 on 128-wide MXU lanes: useful ceiling is half peak
    att_bf16_floor = att_flops / (PEAK_BF16 / 2)
    # int8-QK: QK half at int8 (useful = PEAK_INT8/2), PV half bf16
    att_i8_floor = (att_flops / 2) / (PEAK_INT8 / 2) \
        + (att_flops / 2) / (PEAK_BF16 / 2)
    lin_floor = lin_flops / PEAK_BF16
    # ACHIEVABLE ceilings, from the MEASURED v5e MXU rates (292 int8 /
    # 191 bf16 raw T/s, tools/bench_int8mm.py) instead of spec peaks.
    # Round 5's per-pass decomposition (tools/bench_i8_decomp.py)
    # showed the int8 flash kernel core runs AT this ceiling (116.2
    # useful vs 115.6 predicted at the 5s shape): the spec-peak floor
    # below is unreachable by construction, not by kernel deficiency.
    att_i8_ach = (att_flops / 2) / (292e12 / 2) \
        + (att_flops / 2) / (191e12 / 2)
    att_bf16_ach = att_flops / (191e12 / 2)
    return {
        "att_tflop_per_nfe": att_flops / 1e12,
        "lin_tflop_per_nfe": lin_flops / 1e12,
        "floor_bf16_s_per_nfe": att_bf16_floor + lin_floor,
        "floor_int8qk_s_per_nfe": att_i8_floor + lin_floor,
        "floor_allint8_s_per_nfe": att_i8_floor + lin_flops / PEAK_INT8,
        "achievable_bf16_s_per_nfe": att_bf16_ach + lin_flops / 191e12,
        "achievable_int8qk_s_per_nfe": att_i8_ach + lin_flops / 191e12,
    }


def _conv_cost(voxels, cin, cout, k=27, bytes_per=2):
    """(flops, hbm_bytes) for one causal conv3d producing `voxels`
    outputs: read input + write output (weights are negligible)."""
    flops = 2 * voxels * cin * cout * k
    bytes_ = voxels * (cin + cout) * bytes_per
    return flops, bytes_


def vae_decoder_roofline():
    """Walk the decoder tower (models/vae.py:304-321) at the 5s shape.
    Streaming decode (vae_stream.py) runs every voxel exactly once, so
    full-video counts are the stream path's cost."""
    flops = 0
    bytes_ = 0
    # resolution per stage: (T, H, W, C_in -> channels through stage)
    lat = (T_LAT, H_LAT, W_LAT)

    def vox(t, h, w):
        return t * h * w

    def resnet(t, h, w, cin, cout):
        nonlocal flops, bytes_
        f, b = _conv_cost(vox(t, h, w), cin, cout)
        flops += f; bytes_ += b
        f, b = _conv_cost(vox(t, h, w), cout, cout)
        flops += f; bytes_ += b
        if cin != cout:
            f, b = _conv_cost(vox(t, h, w), cin, cout, k=1)
            flops += f; bytes_ += b

    # post_quant 16->16 1x1 + conv_in 16->512
    f, b = _conv_cost(vox(*lat), 16, 16, k=1); flops += f; bytes_ += b
    f, b = _conv_cost(vox(*lat), 16, 512); flops += f; bytes_ += b
    # mid: resnet + single-head attention (C=512) + resnet
    resnet(*lat, 512, 512)
    s_mid = vox(*lat)
    flops += 2 * 4 * s_mid * 512 * 512          # qkv + out projections
    flops += 4 * s_mid * s_mid * 512            # QK^T + PV (flash)
    resnet(*lat, 512, 512)
    # up blocks: channels 512,512,256,128; upsample after blocks 0,1,2
    t, h, w = lat
    chans = [(512, 512), (512, 512), (512, 256), (256, 128)]
    ups = [(1, 2, 2), (2, 2, 2), (2, 2, 2), None]
    for (cin, cout), up in zip(chans, ups):
        resnet(t, h, w, cin, cout)
        resnet(t, h, w, cout, cout)
        resnet(t, h, w, cout, cout)
        if up is not None:
            ft, fh, fw = up
            t = (t - 1) * ft + 1
            h, w = h * fh, w * fw
            f, b = _conv_cost(vox(t, h, w), cout, cout)
            flops += f; bytes_ += b
    # conv_out 128->3 at full res
    f, b = _conv_cost(vox(t, h, w), 128, 3)
    flops += f; bytes_ += b
    assert (t, h, w) == (FRAMES, H_PIX, W_PIX), (t, h, w)
    return {
        "tflop": flops / 1e12,
        "hbm_gb": bytes_ / 1e9,
        "floor_mxu_s": flops / PEAK_BF16,
        "floor_hbm_s": bytes_ / HBM_BW,
        "floor_s": max(flops / PEAK_BF16, bytes_ / HBM_BW),
        # achievable: the Pallas implicit-GEMM tower's measured average
        # sustained rate across the decoder shape classes (~125 TF/s,
        # tools/bench_conv_pallas_all.py; per-shape 102-135 — halo
        # over-fetch + 27 small-N matmuls per tile keep it under the
        # 191 measured MXU peak). The round-5 stage ablation
        # (tools/bench_vae_stream_decomp.py) measured the conv tower
        # alone at 7.03 s of the 7.63 s stream decode — matching this
        # ceiling (879 TF / 125 TF/s = 7.0 s); attention 0.10 s,
        # GroupNorm+SiLU 0.48 s, carried history ~0.
        "achievable_s": flops / 125e12,
    }


def text_rooflines():
    """Qwen2.5-VL 7B expansion decode: HBM-bound — every generated
    token reads all 28 layers' weights + the lm_head (the embedding
    table is a one-row gather, not a full read). The bench decodes the
    full max_new_tokens=256 (random weights never emit EOS)."""
    h, inter, layers = 3584, 18944, 28
    per_layer = h * (h + 512 + 512 + h) + 3 * h * inter
    lm_head = 152064 * h
    bytes_per_tok = (layers * per_layer + lm_head) * 2   # bf16
    n_new = 256
    decode_floor = n_new * bytes_per_tok / HBM_BW
    return {
        "expand_floor_s": decode_floor,
        "expand_floor_int8_s": decode_floor / 2,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(here, "BENCH_EXTRA.json")) as f:
            meas = json.load(f)
    except FileNotFoundError:
        meas = {}

    dn = denoise_rooflines()
    vae = vae_decoder_roofline()
    txt = text_rooflines()

    rows = []

    def row(stage, floor, measured, wall):
        rows.append({
            "stage": stage, "floor_s": round(floor, 2),
            "measured_s": measured,
            "sol_frac": round(floor / measured, 2) if measured else None,
            "wall": wall,
        })

    row("denoise 16 NFE (bf16 flash)", dn["floor_bf16_s_per_nfe"] * NFE,
        meas.get("denoise_bf16_s"), "MXU (d=64: ceiling = peak/2)")
    row("denoise 16 NFE (int8-QK)", dn["floor_int8qk_s_per_nfe"] * NFE,
        meas.get("denoise_s"), "MXU")
    row("denoise 16 NFE (all-int8)", dn["floor_allint8_s_per_nfe"] * NFE,
        meas.get("denoise_allint8_s"), "MXU")
    row("VAE decode (streaming)", vae["floor_s"], meas.get("vae_s"),
        f"MXU ({vae['tflop']:.0f} TF; HBM floor {vae['floor_hbm_s']:.1f}s)")
    row("prompt expansion (bf16)", txt["expand_floor_s"],
        meas.get("text_expand_s"), "HBM (weight reads/token)")
    row("prompt expansion (int8)", txt["expand_floor_int8_s"],
        meas.get("text_expand_int8_s"), "HBM")

    if args.json:
        print(json.dumps(rows, indent=1))
        return
    print(f"{'stage':36} {'floor':>7} {'meas':>7} {'SoL':>5}  wall")
    for r in rows:
        m = f"{r['measured_s']:7.2f}" if r["measured_s"] else "      -"
        s = f"{r['sol_frac']:5.2f}" if r["sol_frac"] else "    -"
        print(f"{r['stage']:36} {r['floor_s']:7.2f} {m} {s}  {r['wall']}")
    print(f"\n# attention {dn['att_tflop_per_nfe']:.0f} TF/NFE, linears "
          f"{dn['lin_tflop_per_nfe']:.0f} TF/NFE; VAE {vae['tflop']:.0f} TF "
          f"/ {vae['hbm_gb']:.0f} GB HBM")


if __name__ == "__main__":
    main()
