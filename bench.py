"""Benchmark: end-to-end 5s distill-16 latency, measured like the
baseline (BASELINE.md: second run, 768x512, including prompt expansion,
text encode, denoise and VAE decode).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 35.0 (<1.0 beats the reference's H100 distill-5s
end-to-end number; that target assumes v5e-8 — this harness runs on
however many chips are visible, currently one). Stage breakdown goes to
stderr and BENCH_EXTRA.json.

Round-4 structure (the round-3 driver run timed out before printing any
metric — rc=124): the harness is now WALL-CLOCK BUDGETED.

  * The headline JSON is printed IMMEDIATELY after the three core
    stages (text + denoise + VAE) and BENCH_EXTRA.json is written at
    the same moment; every later stage is an optional extra.
  * The text stage runs in a SUBPROCESS with its own timeout: a
    service-cold Qwen encode compile measured 723.8 s in round 3 — if
    it cannot finish inside its slice the subprocess is killed, the
    run proceeds without text, and the headline says so
    ("text_stage": "timeout"). The subprocess also returns the 15 GB
    of Qwen HBM to the chip on exit.
  * Extras (bf16-faithful A/B, all-int8, shard-compute, 10s NABLA,
    density sweep, v5e-8 projection) each check the remaining budget
    against a worst-case cost estimate and skip loudly if they don't
    fit. BENCH_EXTRA.json is re-written after every extra so a kill
    loses at most one stage. The headline line is re-printed at exit.
  * Steady-state anomaly guard: round 3's official log recorded a
    651 s "steady" bf16 run whose first (compile-included) run took
    117.8 s. Every measured stage now logs per-chunk wall times,
    counts XLA compile events during the steady run (recompile
    detection via jax.monitoring), and re-measures once when the
    steady run exceeds 1.5x the first run.

Flags:
  --budget N     total wall-clock budget in seconds (default
                 $KANDINSKY5_TPU_BENCH_BUDGET or 1500)
  --quick        2 denoise steps, skip text/VAE/extras
  --no-text      skip the text stage
  --no-nabla10s  skip the 10s NABLA extras
  --text-stage F internal: run only the text stage, dump JSON to F

Timing notes: through the tunneled axon backend ``block_until_ready``
does not synchronize and host fetches are slow (~10 MB/s), so each
phase is timed by fetching a scalar reduction (one ~30 ms round trip).
Single executions >~1 min crash the tunneled worker, so the 16-NFE run
is chunked (4x4 steps — same compute, 4 extra host round trips).
"""

import functools
import gc
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

BASELINE_5S = 35.0    # H100 distill-16 5s end-to-end (BASELINE.md)
BASELINE_10S_PAIR = 224.0 / 50  # H100 SFT-10s per NFE pair (100 NFE)

_T0 = time.perf_counter()
_BUDGET = [1500.0]

# one id per harness invocation: every key in BENCH_EXTRA is tagged in
# ``_provenance`` with the run that measured it, and keys NOT re-measured
# this run carry forward from the on-disk file instead of being dropped
# (round 4's final artifact silently lost the shard anchors and the
# untiled-VAE PSNR that only the earlier same-round run had measured)
_RUN_ID = time.strftime("%Y%m%d-%H%M%S")

# keys that describe THIS invocation, never carried across runs
_RUN_LOCAL = {
    "budget_s", "elapsed_at_headline_s", "elapsed_total_s",
    "extras_skipped", "extras_failed", "text_stage", "run_id",
    "_provenance",
}

_PRIOR = {}
_PRIOR_PROV = {}


def _load_prior_extra():
    """Load the previous BENCH_EXTRA.json (if any) so un-re-measured
    keys survive this run. Run-local keys are dropped."""
    try:
        with open("BENCH_EXTRA.json") as f:
            prior = json.load(f)
    except (OSError, ValueError):
        return
    prov = prior.pop("_provenance", {})
    prior_run = prior.pop("run_id", "pre-merge")
    for k in list(prior):
        if k in _RUN_LOCAL:
            prior.pop(k)
    _PRIOR.update(prior)
    for k in prior:
        _PRIOR_PROV[k] = prov.get(k, prior_run)


def merged_extra(extra):
    """Prior keys carried forward + this run's keys on top, with a
    per-key provenance map (VERDICT r4 item 1a)."""
    out = dict(_PRIOR)
    prov = dict(_PRIOR_PROV)
    for k, v in extra.items():
        if k == "extras_cost_s" and isinstance(out.get(k), dict):
            m = dict(out[k])
            m.update(v)
            out[k] = m
        else:
            out[k] = v
        prov[k] = _RUN_ID
    for k in _RUN_LOCAL:
        prov.pop(k, None)
    out["run_id"] = _RUN_ID
    out["_provenance"] = prov
    return out


def remaining():
    return _BUDGET[0] - (time.perf_counter() - _T0)


# --------------------------------------------------------------------------
# Compile-event monitor: counts XLA compile activity inside a window so a
# "steady" (supposedly compile-free) measurement can prove whether a
# recompile happened (round-3 651 s anomaly diagnosis, VERDICT item 2).
# --------------------------------------------------------------------------
_COMPILE_EVENTS = []


def _install_compile_monitor():
    try:
        from jax import monitoring

        def _listen(event, duration, **kw):
            if "compil" in event:
                _COMPILE_EVENTS.append((event, duration))

        monitoring.register_event_duration_secs_listener(_listen)
    except Exception as e:  # noqa: BLE001
        print(f"# compile monitor unavailable: {e}", file=sys.stderr)


class compile_watch:
    """Context manager: how many compile events (and seconds of compile)
    happened inside the block."""

    def __enter__(self):
        self.n0 = len(_COMPILE_EVENTS)
        return self

    def __exit__(self, *exc):
        evs = _COMPILE_EVENTS[self.n0:]
        self.count = len(evs)
        self.seconds = sum(d for _, d in evs)
        return False

    count = 0
    seconds = 0.0


def _sync_scalar(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[(0,) * (x.ndim - 1)][..., :1].astype(jnp.float32)))


# --------------------------------------------------------------------------
# Text stage (runs in a subprocess — see bench_text_subprocess)
# --------------------------------------------------------------------------

def bench_text_stage(extra):
    """Prompt expansion (1x greedy decode) + cond/uncond Qwen encode +
    2x CLIP pooled, full-size random weights (converted-checkpoint
    shapes). Returns seconds for [expansion, qwen encode x2, clip x2]."""
    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.text.clip import (
        ClipTextConfig,
        clip_pooled,
        init_clip_params_random,
    )
    from kandinsky5_tpu.text.qwen import (
        QwenTextConfig,
        init_qwen_params_random,
        qwen_encode,
        qwen_generate_greedy,
    )

    qcfg = QwenTextConfig()
    qp = init_qwen_params_random(jax.random.PRNGKey(3), qcfg,
                                 dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    # conditioning encode: video template = 256 tokens + crop 129
    ids = rng.randint(0, qcfg.vocab_size, (1, 256 + 129)).astype(np.int32)
    mask = np.ones_like(ids, bool)
    t0 = time.perf_counter()
    emb, _ = qwen_encode(qp, qcfg, ids, mask, 129)
    _sync_scalar(emb)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2):  # cond + uncond (reference generation_utils.py:156-162)
        emb, _ = qwen_encode(qp, qcfg, ids, mask, 129)
        _sync_scalar(emb)
    t_encode = time.perf_counter() - t0
    print(f"# qwen encode: compile+first {compile_s:.1f}s, steady 2x "
          f"{t_encode:.2f}s", file=sys.stderr)
    extra["text_encode_compile_s"] = round(compile_s, 1)

    # prompt expansion: ~380-token beautifier instruction, 256 new tokens
    # (reference t2v_pipeline.py:47-88); random weights rarely emit EOS,
    # so this measures the full-length worst case
    eids = rng.randint(0, qcfg.vocab_size, (1, 380)).astype(np.int32)
    t0 = time.perf_counter()
    out = qwen_generate_greedy(qp, qcfg, eids, max_new_tokens=256)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = qwen_generate_greedy(qp, qcfg, eids, max_new_tokens=256)
    t_expand = time.perf_counter() - t0
    print(f"# prompt expansion: compile+first {compile_s:.1f}s, steady "
          f"{t_expand:.2f}s ({max(len(out), 1)} tokens)", file=sys.stderr)

    del qp
    gc.collect()

    # int8-decode opt-in (text/qwen.quantize_qwen_decode_params): decode
    # is bandwidth-bound, so the int8 pytree is built directly at random
    # (quantizing the resident bf16 model would need bf16+int8 in HBM
    # at once; values don't affect timing)
    try:
        t_expand_q = _bench_expand_int8(qcfg, eids)
        extra["text_expand_int8_s"] = round(t_expand_q, 2)
        print(f"# prompt expansion int8: steady {t_expand_q:.2f}s "
              f"(opt-in KANDINSKY5_TPU_INT8_EXPAND)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# int8 expansion skipped: {type(e).__name__}: {e}"[:160],
              file=sys.stderr)
    gc.collect()

    ccfg = ClipTextConfig()
    cp = init_clip_params_random(jax.random.PRNGKey(4), ccfg)
    cids = jnp.asarray(rng.randint(0, ccfg.vocab_size, (1, 77)), jnp.int32)
    cmask = jnp.ones((1, 77), jnp.int32)
    _sync_scalar(clip_pooled(cp, ccfg, cids, cmask))
    t0 = time.perf_counter()
    for _ in range(2):
        _sync_scalar(clip_pooled(cp, ccfg, cids, cmask))
    t_clip = time.perf_counter() - t0
    print(f"# clip pooled: steady 2x {t_clip:.3f}s", file=sys.stderr)
    del cp
    gc.collect()

    extra["text_expand_s"] = round(t_expand, 2)
    extra["text_encode_s"] = round(t_encode, 2)
    extra["clip_s"] = round(t_clip, 3)
    return t_expand + t_encode + t_clip


def _bench_expand_int8(qcfg, eids):
    """Decode throughput with the int8 weight layout (random values)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.text.qwen import qwen_generate

    key = jax.random.PRNGKey(7)
    L, h, d = qcfg.num_hidden_layers, qcfg.hidden_size, qcfg.head_dim
    hq, hkv = qcfg.num_attention_heads, qcfg.num_key_value_heads
    inter, V = qcfg.intermediate_size, qcfg.vocab_size

    def qw(k, *s):
        # scale mirrors quantize_qwen_decode_params's layout: per-output
        # channel, keeping the stacked L axis for the decode scan
        scale_shape = (s[0], s[-1]) if len(s) == 3 else s[-1:]
        return {"weight_q": jax.random.randint(k, s, -127, 127, jnp.int8),
                "scale": jnp.full(scale_shape, 1e-3, jnp.float32)}

    ks = iter(jax.random.split(key, 16))
    qp = {
        "embed_tokens": {"weight": jax.random.uniform(
            next(ks), (V, h), jnp.bfloat16, -0.02, 0.02)},
        "norm": {"weight": jnp.ones((h,), jnp.bfloat16)},
        "lm_head": qw(next(ks), h, V),
        "layers": {
            "input_layernorm": {"weight": jnp.ones((L, h), jnp.bfloat16)},
            "post_attention_layernorm": {
                "weight": jnp.ones((L, h), jnp.bfloat16)},
            "self_attn": {
                "q_proj": dict(qw(next(ks), L, h, hq * d),
                               bias=jnp.zeros((L, hq * d), jnp.bfloat16)),
                "k_proj": dict(qw(next(ks), L, h, hkv * d),
                               bias=jnp.zeros((L, hkv * d), jnp.bfloat16)),
                "v_proj": dict(qw(next(ks), L, h, hkv * d),
                               bias=jnp.zeros((L, hkv * d), jnp.bfloat16)),
                "o_proj": qw(next(ks), L, hq * d, h),
            },
            "mlp": {
                "gate_proj": qw(next(ks), L, h, inter),
                "up_proj": qw(next(ks), L, h, inter),
                "down_proj": qw(next(ks), L, inter, h),
            },
        },
    }
    qwen_generate(qp, qcfg, eids, max_new_tokens=256)
    t0 = _time.perf_counter()
    qwen_generate(qp, qcfg, eids, max_new_tokens=256)
    t = _time.perf_counter() - t0
    del qp
    return t


def bench_text_subprocess(extra, slice_s):
    """Run the text stage in a child process with a hard timeout.

    Isolation buys two things: a service-cold Qwen compile (measured
    723.8 s in the round-3 driver run) cannot eat the whole budget —
    the child is killed and the bench continues without text — and the
    Qwen weights' ~15 GB of HBM is returned on child exit before the
    DiT stage. Returns the text stage total in seconds, or 0.0 with
    extra["text_stage"] set when skipped/killed."""
    out_path = tempfile.mktemp(suffix=".json", prefix="k5_text_")
    cmd = [sys.executable, os.path.abspath(__file__), "--text-stage",
           out_path]
    print(f"# text stage: subprocess, timeout {slice_s:.0f}s",
          file=sys.stderr)
    try:
        res = subprocess.run(cmd, timeout=slice_s)
    except subprocess.TimeoutExpired:
        extra["text_stage"] = "timeout"
        print(f"# text stage KILLED at {slice_s:.0f}s (service-cold "
              f"compile did not fit) — headline excludes text",
              file=sys.stderr)
        return 0.0
    if res.returncode != 0 or not os.path.exists(out_path):
        extra["text_stage"] = f"failed rc={res.returncode}"
        print(f"# text stage failed (rc={res.returncode}) — headline "
              f"excludes text", file=sys.stderr)
        return 0.0
    with open(out_path) as f:
        payload = json.load(f)
    os.unlink(out_path)
    total = payload.pop("total")
    extra.update(payload)
    return total


def _text_stage_main(out_path):
    """Child-process entry for --text-stage."""
    import kandinsky5_tpu  # noqa: F401  persistent compile cache

    _install_compile_monitor()
    extra = {}
    total = bench_text_stage(extra)
    with open(out_path, "w") as f:
        json.dump({"total": total, **extra}, f)


# --------------------------------------------------------------------------
# Denoise
# --------------------------------------------------------------------------

def _denoise_harness(quick):
    """Build DiT params + spec + inputs for the 5s distill-16 shape.
    Returns (params, spec, run, meta) where run(spec_override) executes
    the chunked trajectory with per-chunk timing."""
    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import fast_init_dit_params
    from kandinsky5_tpu.pipeline import default_attn_impl
    from kandinsky5_tpu.sampling import (
        DenoiseSpec,
        denoise_residual0,
        denoise_span,
        timestep_grid,
    )

    cfg = DiTParams()  # released 2B architecture
    params = fast_init_dit_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)

    # multi-chip-ready: the day >1 device is visible, shard tp=N with
    # the production plan (validated continuously on the virtual CPU
    # mesh by tests/test_tp_parity.py and the driver dryrun)
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        from kandinsky5_tpu.parallel.sharding import (
            plan_dit_mesh,
            shard_dit_params,
        )

        mesh = plan_dit_mesh(n_dev, num_heads=cfg.num_heads)
        params = shard_dit_params(params, mesh)
        print(f"# denoise: sharding {dict(mesh.shape)}", file=sys.stderr)

    # 5s distill config: 16 NFE, no CFG (guidance 1.0), 768x512
    # latent (31, 64, 96, 16) -> 47,616 visual tokens (BASELINE.md)
    chunk_steps = 2 if quick else 4
    n_chunks = 1 if quick else 4
    num_steps = chunk_steps * n_chunks
    impl0 = default_attn_impl(n_dev if mesh is not None else 1)
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=num_steps, guidance_weight=1.0,
        scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
        attention_type="flash", attn_impl=impl0,
    )

    rng = np.random.RandomState(0)
    L = 256
    noise = jnp.asarray(rng.randn(1, 31, 64, 96, 16), jnp.float32)
    te = jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.bfloat16)
    mask = jnp.ones((1, L), bool)
    skip = jnp.zeros((num_steps, 2), bool)
    ts = timestep_grid(num_steps, spec.scheduler_scale)
    times, dts = jnp.asarray(ts[:-1]), jnp.asarray(np.diff(ts))
    b_eff, seq_len = denoise_residual0(spec, noise.shape)
    res0 = jnp.zeros((b_eff, seq_len, cfg.model_dim), jnp.bfloat16)

    from contextlib import nullcontext

    from kandinsky5_tpu.parallel.sharding import sharding_ctx

    def run(spec_i, params_i=None, chunk_times=None, chunks=None):
        # the TRUE num_steps trajectory integrated in chunked spans
        # (the tunneled bench chip kills single executions >~1 min;
        # denoise_span threads the exact scan carry across chunks).
        # ``chunks`` limits the trajectory to its first N spans — the
        # short A/B mode (same compiled fn, same carry semantics).
        p = params if params_i is None else params_i
        x, res = noise, res0
        with (sharding_ctx(mesh) if mesh is not None else nullcontext()):
            for c in range(n_chunks if chunks is None else chunks):
                tc = time.perf_counter()
                sl = slice(c * chunk_steps, (c + 1) * chunk_steps)
                x, res = denoise_span(p, spec_i, x, res, times[sl],
                                      dts[sl], te, pe, mask, te, pe, mask,
                                      skip[sl])
                _sync_scalar(x)
                if chunk_times is not None:
                    chunk_times.append(time.perf_counter() - tc)
        return x

    meta = dict(num_steps=num_steps, mesh=mesh, impl0=impl0, n_dev=n_dev,
                chunk_steps=chunk_steps)
    return params, spec, run, meta


def _measure_trajectory(run, spec, label, num_steps, extra, key,
                        params_i=None):
    """compile+first, then steady with per-chunk times, compile-event
    watch, and a one-shot re-measure when steady > 1.5x first (the
    round-3 651 s bf16 anomaly guard)."""
    t0 = time.perf_counter()
    latents = run(spec, params_i)
    compile_s = time.perf_counter() - t0
    chunks = []
    with compile_watch() as cw:
        t0 = time.perf_counter()
        latents = run(spec, params_i, chunk_times=chunks)
        t_steady = time.perf_counter() - t0
    chunk_str = "/".join(f"{c:.1f}" for c in chunks)
    note = ""
    if cw.count:
        note = (f"; RECOMPILE during steady: {cw.count} events "
                f"({cw.seconds:.1f}s)")
        extra[f"{key}_steady_recompile_s"] = round(cw.seconds, 1)
    if t_steady > 1.5 * compile_s and compile_s > 1.0:
        # steady slower than the compile-included first run: re-measure
        # once and report both (round-3 anomaly was 651 s vs 117.8 s)
        print(f"# denoise[{label}]: ANOMALY steady {t_steady:.1f}s > 1.5x "
              f"first {compile_s:.1f}s (chunks {chunk_str}{note}); "
              f"re-measuring once", file=sys.stderr)
        extra[f"{key}_anomaly_first_steady_s"] = round(t_steady, 1)
        chunks2 = []
        with compile_watch() as cw2:
            t0 = time.perf_counter()
            latents = run(spec, params_i, chunk_times=chunks2)
            t2 = time.perf_counter() - t0
        print(f"# denoise[{label}]: re-measure {t2:.1f}s (chunks "
              f"{'/'.join(f'{c:.1f}' for c in chunks2)}; "
              f"{cw2.count} compile events)", file=sys.stderr)
        t_steady = min(t_steady, t2)
    print(f"# denoise[{label}]: compile+first {compile_s:.1f}s, steady "
          f"{t_steady:.1f}s ({num_steps} steps, "
          f"{t_steady / num_steps:.2f} s/NFE; chunks {chunk_str}{note})",
          file=sys.stderr)
    extra[key] = round(t_steady, 2)
    extra[f"{key}_per_nfe"] = round(t_steady / num_steps, 3)
    return t_steady, latents


def bench_denoise(quick, extra):
    """Core denoise measurement: the PIPELINE DEFAULT path only
    (int8-QK flash on a single chip). The faithful-bf16 A/B and
    all-int8 variants run later as budgeted extras."""
    params, spec, run, meta = _denoise_harness(quick)
    t_denoise, latents = _measure_trajectory(
        run, spec, spec.attn_impl, meta["num_steps"], extra, "denoise_s")
    extra["denoise_attn_impl"] = meta["impl0"]
    extra["denoise_devices"] = meta["n_dev"]
    del params
    gc.collect()
    return t_denoise, latents, meta


def bench_denoise_faithful(quick, extra, latents_int8, budget_all_int8,
                           full=False):
    """Extra stage: the faithful bf16 kernel A/B against the int8-QK
    default, plus an environment-drift probe and (budget permitting)
    the opt-in all-int8 (W8A8) variant.

    Default is the SHORT mode (VERDICT r4 item 1b): one 4-step span per
    variant — the per-NFE rate is chunk-stationary (measured r4 chunk
    times varied <2% within a trajectory), so s/NFE x 16 reproduces the
    full number at a quarter of the device time; the latent PSNRs
    compare the two 4-step trajectories from the same noise.
    ``full=True`` restores the round-4 full-16-step behavior (the
    question it answers — is bf16 steady ~116 s — was settled in r4;
    re-run it only when budget abounds)."""
    import dataclasses

    import jax.numpy as jnp

    from kandinsky5_tpu.utils.metrics import psnr

    params, spec0, run, meta = _denoise_harness(quick)
    if meta["mesh"] is not None or meta["impl0"] != "flash_int8":
        print("# faithful A/B skipped: not on the single-chip int8 "
              "default path", file=sys.stderr)
        return
    chunks = None if full else 1
    steps = meta["num_steps"] if full else meta["chunk_steps"]
    extra["denoise_ab_steps"] = steps

    def measure(spec_i, label, key, params_i=None):
        t0 = time.perf_counter()
        lat = run(spec_i, params_i, chunks=chunks)
        compile_s = time.perf_counter() - t0
        with compile_watch() as cw:
            t0 = time.perf_counter()
            lat = run(spec_i, params_i, chunks=chunks)
            t = time.perf_counter() - t0
        note = (f"; RECOMPILE during steady: {cw.count}" if cw.count else "")
        print(f"# denoise[{label}]: compile+first {compile_s:.1f}s, steady "
              f"{t:.1f}s ({steps} steps, {t / steps:.2f} s/NFE{note})",
              file=sys.stderr)
        extra[f"{key}_per_nfe"] = round(t / steps, 3)
        extra[key] = round(t if full else t / steps * 16, 2)
        if not full:
            extra[f"{key}_mode"] = f"chunk{steps}_x{16 // steps}"
        return lat

    if full:
        spec_bf = dataclasses.replace(spec0, attn_impl="auto")
        _, lat_bf = _measure_trajectory(
            run, spec_bf, "bf16 faithful", steps, extra, "denoise_bf16_s")
        lat_i8 = latents_int8
    else:
        spec_bf = dataclasses.replace(spec0, attn_impl="auto")
        lat_bf = measure(spec_bf, "bf16 faithful 4-step", "denoise_bf16_s")
        # the int8 span is both the PSNR counterpart (same 4-step
        # trajectory) and the environment-drift probe (divergence from
        # the headline per-NFE means the machine changed mid-run, not
        # the code). An UN-timed warm call first: bench_vae_int8 runs
        # earlier in the round-5 order and calls jax.clear_caches()
        # around its env flip, so the first span here pays retrace +
        # cache load — timing that would misread as drift
        _ = run(spec0, chunks=1)
        t0 = time.perf_counter()
        lat_i8 = run(spec0, chunks=1)
        t_re = time.perf_counter() - t0
        head = extra.get("denoise_s_per_nfe")
        print(f"# denoise[int8 re-measure]: {t_re / steps:.3f} s/NFE "
              f"(headline was {head} s/NFE)", file=sys.stderr)
        extra["denoise_int8_remeasure_s_per_nfe"] = round(t_re / steps, 3)

    ref = np.asarray(lat_bf.astype(jnp.float32))
    got = np.asarray(lat_i8.astype(jnp.float32))
    rng_v = max(float(ref.max() - ref.min()), 1e-6)
    p = psnr(got, ref, max_val=rng_v)
    print(f"# int8-QK latent PSNR vs bf16 ({steps} steps): {p:.1f} dB",
          file=sys.stderr)
    extra["denoise_int8_vs_bf16_psnr_db"] = round(float(p), 1)

    if full and remaining() > 150:
        t0 = time.perf_counter()
        _ = run(spec0)
        t_re = time.perf_counter() - t0
        print(f"# denoise[int8 re-measure]: {t_re:.1f}s (headline was "
              f"{extra.get('denoise_s')}s)", file=sys.stderr)
        extra["denoise_int8_remeasure_s"] = round(t_re, 2)

    if remaining() > budget_all_int8:
        # all-int8: W8A8 projections (models/dit.py:quantize_dit_params)
        # on top of the int8-QK kernel — the opportunistic single-chip
        # floor, OPT-IN (KANDINSKY5_TPU_INT8_LINEAR)
        from kandinsky5_tpu.models.dit import quantize_dit_params

        qparams = quantize_dit_params(params)
        if full:
            _, lat_q = _measure_trajectory(
                run, spec0, "all-int8", steps, extra, "denoise_allint8_s",
                params_i=qparams)
        else:
            lat_q = measure(spec0, "all-int8 4-step", "denoise_allint8_s",
                            params_i=qparams)
        got = np.asarray(lat_q.astype(jnp.float32))
        p = psnr(got, ref, max_val=rng_v)
        print(f"# all-int8 latent PSNR vs bf16: {p:.1f} dB",
              file=sys.stderr)
        extra["denoise_allint8_vs_bf16_psnr_db"] = round(float(p), 1)
        del qparams
    else:
        print(f"# all-int8 stage skipped: {remaining():.0f}s left < "
              f"{budget_all_int8}s estimate", file=sys.stderr)
    del params
    gc.collect()


def bench_shard_compute(extra):
    """Measured per-device DiT block cost under the v5e-8 plan (tp=4 x
    sp=2, parallel.sharding.plan_dit_mesh(8, 28)).

    Runs the EXACT per-shard workload of one visual block on the real
    chip: q/k/v projections on the local S/2 sequence at 7 local heads,
    QK-RMSNorm + RoPE, flash attention of the local S/2 queries against
    full-S keys/values (the sp all-gather's RESULT, emulated by
    concatenating the local K/V with itself — the gather's compute cost
    is zero; its ICI cost is modeled in project_v5e8), attention-out /
    FF GEMMs at 1/tp width, cross-attention against 256 text keys, and
    every AdaLN elementwise pass at local width. The same harness also
    runs at FULL single-chip shapes so the measured scan/prologue
    residual (denoise_s_per_nfe - 32 x full-block) can be carried into
    the projection. Upgrades project_v5e8 from 'single-chip rates / 8'
    to measured per-shard compute + modeled collectives."""
    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.models import nn as dnn
    from kandinsky5_tpu.ops.attention import attention

    D, FF, H, HD, S, LT = 1792, 7168, 28, 64, 47616, 256
    bf = jnp.bfloat16

    def build(tp, sp):
        Dl, FFl, Hl, Sh = D // tp, FF // tp, H // tp, S // sp
        ks = iter(jax.random.split(jax.random.PRNGKey(0), 32))

        def w(*shape, dt=bf):
            return jax.random.normal(next(ks), shape, dt) * 0.02

        p_sa = {"to_query": {"weight": w(D, Dl), "bias": w(Dl)},
                "to_key": {"weight": w(D, Dl), "bias": w(Dl)},
                "to_value": {"weight": w(D, Dl), "bias": w(Dl)},
                "out_layer": {"weight": w(Dl, D), "bias": w(D)},
                "query_norm": {"weight": w(HD)},
                "key_norm": {"weight": w(HD)}}
        p_ca = {k: {kk: w(*vv.shape, dt=vv.dtype) for kk, vv in v.items()}
                for k, v in p_sa.items()}
        p_ff = {"in_layer": {"weight": w(D, FFl)},
                "out_layer": {"weight": w(FFl, D)}}
        p_mod = {"out_layer": {"weight": w(512, 9 * D, dt=jnp.float32),
                               "bias": w(9 * D, dt=jnp.float32)}}
        x = w(1, Sh, D)
        text = w(1, LT, D)
        temb = w(1, 512)
        cos_h, sin_h = dnn.rope_1d(jnp.arange(Sh), HD)
        tmask = jnp.ones((1, LT), bool)

        def shard_block(x, impl):
            mod = dnn.modulation(p_mod, temb)
            m = [mod[:, i * D:(i + 1) * D][:, None, :] for i in range(9)]
            (sh_sa, sc_sa, g_sa, sh_ca, sc_ca, g_ca,
             sh_ff, sc_ff, g_ff) = m
            out = dnn.apply_scale_shift_norm(x, sc_sa, sh_sa)
            q, k, v = dnn.qkv_proj(p_sa, out, Hl)
            q = dnn.apply_rotary(q, cos_h, sin_h)
            k = dnn.apply_rotary(k, cos_h, sin_h)
            if sp > 1:  # the sp KV all-gather's result, compute-free
                k = jnp.concatenate([k] * sp, axis=1)
                v = jnp.concatenate([v] * sp, axis=1)
            a = attention(q, k, v, impl=impl)
            out = dnn.linear(p_sa["out_layer"], a.reshape(1, Sh, Dl))
            x = dnn.apply_gate_sum(x, out, g_sa)
            out = dnn.apply_scale_shift_norm(x, sc_ca, sh_ca)
            qc = dnn.linear(p_ca["to_query"], out).reshape(1, Sh, Hl, HD)
            kc = dnn.linear(p_ca["to_key"], text).reshape(1, LT, Hl, HD)
            vc = dnn.linear(p_ca["to_value"], text).reshape(1, LT, Hl, HD)
            qc = dnn.rms_norm(qc, p_ca["query_norm"]["weight"]).astype(bf)
            kc = dnn.rms_norm(kc, p_ca["key_norm"]["weight"]).astype(bf)
            a = attention(qc, kc, vc, kv_mask=tmask, impl=impl)
            out = dnn.linear(p_ca["out_layer"], a.reshape(1, Sh, Dl))
            x = dnn.apply_gate_sum(x, out, g_ca)
            out = dnn.apply_scale_shift_norm(x, sc_ff, sh_ff)
            out = dnn.feed_forward(p_ff, out)
            return dnn.apply_gate_sum(x, out, g_ff)

        @functools.partial(jax.jit, static_argnames=("impl", "n"))
        def chain(x, impl, n):
            for _ in range(n):
                x = shard_block(x, impl)
            return x

        return x, chain

    results = {}
    for name, tp, sp, impls in [("shard", 4, 2, ("auto", "flash_int8")),
                                ("full", 1, 1, ("auto",))]:
        x0, chain = build(tp, sp)
        n = 8
        for impl in impls:
            _sync_scalar(chain(x0, impl, n))  # compile
            t0 = time.perf_counter()
            _sync_scalar(chain(x0, impl, n))
            t = (time.perf_counter() - t0) / n
            results[(name, impl)] = t
            print(f"# shard-compute [{name} tp={tp} sp={sp} {impl}]: "
                  f"{t * 1e3:.1f} ms/block", file=sys.stderr)
        del x0, chain
        gc.collect()

    extra["shard_block_ms"] = round(results[("shard", "auto")] * 1e3, 2)
    extra["shard_block_int8_ms"] = round(
        results[("shard", "flash_int8")] * 1e3, 2)
    extra["full_block_ms"] = round(results[("full", "auto")] * 1e3, 2)


def bench_vae(latents, extra):
    """Measures BOTH decode paths: the faithful tiled decode (the
    multi-chip/dp path and the parity reference) and the streaming
    state-carry decode (the single-chip pipeline default,
    models/vae_stream.py — no 2.26x overlap recompute), plus the PSNR
    between them on a 4-frame slice (full frames cannot be fetched
    through the ~10 MB/s tunnel). ``vae_s`` is the shipped single-chip
    default (stream); ``vae_tiled_s`` feeds the v5e-8 dp projection."""
    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.models.vae import HunyuanVideoVAE, init_vae_params
    from kandinsky5_tpu.utils.metrics import psnr

    vae = HunyuanVideoVAE(
        init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16),
        dtype=jnp.bfloat16)
    z = latents.astype(jnp.bfloat16)

    def run_decode(mode):
        video = vae.decode(z, mode=mode)
        _sync_scalar(video)
        return video

    times = {}
    frames = {}
    for mode in ("tiled", "stream"):
        t0 = time.perf_counter()
        v = run_decode(mode)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = run_decode(mode)
        times[mode] = time.perf_counter() - t0
        frames[mode] = np.asarray(v[0, 40:44].astype(jnp.float32))
        print(f"# vae decode [{mode}]: compile+first {compile_s:.1f}s, "
              f"steady {times[mode]:.1f}s", file=sys.stderr)
        del v
        gc.collect()

    ref = frames["tiled"]
    rng_v = max(float(ref.max() - ref.min()), 1e-6)
    p = psnr(frames["stream"], ref, max_val=rng_v)
    print(f"# vae stream-vs-tiled PSNR (frames 40-43): {p:.1f} dB "
          f"(random weights — the GroupNorm-drift worst case; see "
          f"tests/test_vae_stream.py for the untiled-reference framing)",
          file=sys.stderr)
    extra["vae_s"] = round(times["stream"], 2)
    extra["vae_tiled_s"] = round(times["tiled"], 2)
    extra["vae_stream_vs_tiled_psnr_db"] = round(p, 1)
    del vae
    gc.collect()
    return times["stream"]


def bench_vae_probe(latents, extra):
    """Three-way fidelity probe at a mid shape where the UNTILED decoder
    fits in HBM (9 latent frames, 256x384 px): both tiled and stream
    are approximations of the SAME untiled network, so stream-vs-tiled
    alone conflates the tiled path's own blend seams with streaming
    drift. This records, on the real chip, how close each path sits to
    the true network (tests/test_vae_stream.py measures the same
    three-way on CPU at toy shapes). Temporal tiling uses the 5s
    default stride (tile 17 / stride 8 frames, models/vae.py OPT).
    Runs as a guarded EXTRA: a failure here loses only the two probe
    keys, never the vae_s headline component."""
    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.models.vae import (
        HunyuanVideoVAE,
        _decode_tile,
        init_vae_params,
    )
    from kandinsky5_tpu.utils.metrics import psnr

    vae = HunyuanVideoVAE(
        init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16),
        dtype=jnp.bfloat16)
    z9 = latents.astype(jnp.bfloat16)[:, :9, :32, :48]
    vae._apply_tiling((17, 256, 384), (8, 256, 384))
    outs = {}
    outs["tiled"] = vae.decode(z9, opt_tiling=False)
    outs["stream"] = vae.decode(z9, opt_tiling=False, mode="stream")
    outs["untiled"] = _decode_tile(vae.params, z9)
    sl = {k: np.asarray(v[0, 12:16].astype(jnp.float32))
          for k, v in outs.items()}
    del outs
    gc.collect()
    rng9 = max(float(sl["untiled"].max() - sl["untiled"].min()), 1e-6)
    p_su = psnr(sl["stream"], sl["untiled"], max_val=rng9)
    p_tu = psnr(sl["tiled"], sl["untiled"], max_val=rng9)
    print(f"# vae three-way probe (9 lat frames, 256x384): "
          f"stream-vs-untiled {p_su:.1f} dB, tiled-vs-untiled {p_tu:.1f} dB",
          file=sys.stderr)
    extra["vae_stream_vs_untiled_psnr_db"] = round(p_su, 1)
    extra["vae_tiled_vs_untiled_psnr_db"] = round(p_tu, 1)
    del vae
    gc.collect()


def bench_vae_int8(latents, extra):
    """Opt-in W8A8 decode convs (KANDINSKY5_TPU_INT8_CONV, see
    DEVIATIONS.md): stream decode time + decoded-frame PSNR vs the bf16
    Pallas tower at the production shape. The env var is read at trace
    time and ``quant`` is a static kernel arg, so flipping it inside
    one process never reuses a stale jit. Guarded EXTRA — the shipped
    default (bf16 tower, ``vae_s``) is untouched."""
    import os

    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.models.vae import HunyuanVideoVAE, init_vae_params
    from kandinsky5_tpu.utils.metrics import psnr

    vae = HunyuanVideoVAE(
        init_vae_params(jax.random.PRNGKey(1), dtype=jnp.bfloat16),
        dtype=jnp.bfloat16)
    z = latents.astype(jnp.bfloat16)

    def run():
        v = vae.decode(z, mode="stream")
        _sync_scalar(v)
        return v

    ref = np.asarray(run()[0, 40:44].astype(jnp.float32))
    os.environ["KANDINSKY5_TPU_INT8_CONV"] = "1"
    # the stream-decode jits were already traced this process with
    # quant=False baked in (the env is read at TRACE time) — without a
    # cache clear the flag flip silently re-times the bf16 tower
    # (first budgeted run: vae_int8_s == vae_s, PSNR inf). The persistent
    # compile cache keeps the forced retrace cheap.
    jax.clear_caches()
    try:
        t0 = time.perf_counter()
        v = run()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = run()
        steady = time.perf_counter() - t0
        sl = np.asarray(v[0, 40:44].astype(jnp.float32))
    finally:
        del os.environ["KANDINSKY5_TPU_INT8_CONV"]
        jax.clear_caches()
    rng_v = max(float(ref.max() - ref.min()), 1e-6)
    p = psnr(sl, ref, max_val=rng_v)
    if not np.isfinite(p):
        print("# vae int8: outputs identical to bf16 — quant did not "
              "engage; discarding the measurement", file=sys.stderr)
        return
    print(f"# vae int8 stream decode: compile+first {compile_s:.1f}s, "
          f"steady {steady:.1f}s, {p:.1f} dB vs bf16 tower",
          file=sys.stderr)
    extra["vae_int8_s"] = round(steady, 2)
    extra["vae_int8_vs_bf16_psnr_db"] = round(p, 1)
    del vae, v
    gc.collect()


def bench_magcache(extra, window=8):
    """MagCache measured on-device (VERDICT r4 item 8): an N-step window
    of the 5s-SFT 50-step CFG run with the CALIBRATED skip schedule
    (configs/config_5s_sft.yaml mag_ratios -> sampling.magcache_schedule)
    vs the same window all-False, on the production denoise_span path
    (sequential CFG — the per-branch skips only pay off when each branch
    is its own forward). The schedule is host-static, so the 50-step
    extrapolation is arithmetic over the measured per-call costs.
    Reference: magcache_utils.py:64-87."""
    import yaml

    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.config import DiTParams, MagCacheConfig
    from kandinsky5_tpu.models.dit import fast_init_dit_params
    from kandinsky5_tpu.pipeline import default_attn_impl
    from kandinsky5_tpu.sampling import (
        DenoiseSpec,
        denoise_span,
        magcache_schedule,
        timestep_grid,
    )

    conf_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "kandinsky5_tpu", "configs", "config_5s_sft.yaml")
    with open(conf_path) as f:
        conf = yaml.safe_load(f)
    mag = MagCacheConfig(mag_ratios=tuple(conf["magcache"]["mag_ratios"]))
    num_steps = conf["model"]["num_steps"]          # 50
    guidance = conf["model"]["guidance_weight"]
    sched = magcache_schedule(mag, num_steps, no_cfg=False)  # (50, 2)
    total_calls = num_steps * 2
    total_skipped = int(sched.sum())

    # densest-skip window of the calibrated schedule
    per_step = sched.sum(axis=1)
    i0 = int(np.argmax(np.convolve(per_step, np.ones(window), "valid")))
    win = sched[i0:i0 + window]
    k_win = int(win.sum())
    if k_win == 0:
        print("# magcache: calibrated schedule has no skips — nothing to "
              "measure", file=sys.stderr)
        return

    cfg = DiTParams()
    params = fast_init_dit_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=num_steps, guidance_weight=guidance,
        scheduler_scale=conf["model"]["scheduler_scale"]
        if "scheduler_scale" in conf["model"] else 5.0,
        scale_factor=(1.0, 2.0, 2.0), attention_type="flash",
        attn_impl=default_attn_impl(1), sequential_cfg=True,
    )
    rng = np.random.RandomState(0)
    L = 256
    noise = jnp.asarray(rng.randn(1, 31, 64, 96, 16), jnp.float32)
    te = jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.bfloat16)
    mask = jnp.ones((1, L), bool)
    ts = timestep_grid(num_steps, spec.scheduler_scale)
    res0 = jnp.zeros((2, 31 * 32 * 48, cfg.model_dim), jnp.bfloat16)

    chunk = 2  # (2 steps x 2 CFG calls)/execution stays under the
    # tunneled chip's ~1 min single-execution bound

    def run_window(skip_arr):
        x, res = noise, res0
        for c in range(window // chunk):
            sl = slice(i0 + c * chunk, i0 + (c + 1) * chunk)
            x, res = denoise_span(
                params, spec, x, res,
                jnp.asarray(ts[sl]), jnp.asarray(np.diff(ts)[sl]),
                te, pe, mask, te, pe, mask,
                jnp.asarray(skip_arr[c * chunk:(c + 1) * chunk]))
            _sync_scalar(x)
        return x

    zeros = np.zeros((window, 2), bool)
    t0 = time.perf_counter()
    run_window(zeros)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_window(zeros)
    t_noskip = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_window(win)
    t_skip = time.perf_counter() - t0
    n_calls = window * 2
    c_full = t_noskip / n_calls
    c_skip = max((t_skip - c_full * (n_calls - k_win)) / k_win, 0.0)
    est_full = c_full * total_calls
    est_mag = c_full * (total_calls - total_skipped) + c_skip * total_skipped
    extra["magcache_window_s"] = round(t_skip, 2)
    extra["magcache_window_noskip_s"] = round(t_noskip, 2)
    extra["magcache_window_skipped_calls"] = k_win
    extra["magcache_sched_skipped_calls"] = total_skipped
    extra["magcache_skipped_call_s"] = round(c_skip, 3)
    extra["magcache_50step_est_s"] = round(est_mag, 1)
    extra["magcache_speedup"] = round(est_full / est_mag, 3)
    print(f"# magcache: compile {compile_s:.1f}s; {window}-step window "
          f"[{i0}:{i0 + window}) no-skip {t_noskip:.1f}s vs calibrated "
          f"{t_skip:.1f}s ({k_win}/{n_calls} calls skipped; skipped call "
          f"{c_skip * 1e3:.0f} ms vs full {c_full:.2f} s) -> 50-step est "
          f"{est_mag:.0f}s vs {est_full:.0f}s = {est_full / est_mag:.2f}x",
          file=sys.stderr)
    del params
    gc.collect()


def bench_nabla10s(extra):
    """One 10s NFE pair (cond+uncond sequential, NABLA sparse path) via
    the host-driven step — the per-step cost of the 100-NFE 10s SFT run."""
    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import fast_init_dit_params
    from kandinsky5_tpu.sampling import DenoiseSpec, denoise_one_call

    cfg = DiTParams()
    params = fast_init_dit_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    spec = DenoiseSpec(
        dit_params=cfg, num_steps=50, guidance_weight=5.0,
        scheduler_scale=5.0, scale_factor=(1.0, 2.0, 2.0),
        attention_type="nabla", attn_impl="auto", sequential_cfg=True,
    )
    rng = np.random.RandomState(0)
    L = 256
    x = jnp.asarray(rng.randn(1, 61, 64, 96, 16), jnp.float32)
    te = jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.bfloat16)
    mask = jnp.ones((1, L), bool)
    res = jnp.zeros((1, 61 * 32 * 48, cfg.model_dim), jnp.bfloat16)

    def pair():
        v, r = denoise_one_call(params, spec, x, te, pe, mask,
                                jnp.float32(0.7), jnp.bool_(False), res)
        _sync_scalar(v)
        v, r = denoise_one_call(params, spec, x, te, pe, mask,
                                jnp.float32(0.7), jnp.bool_(False), res)
        _sync_scalar(v)

    t0 = time.perf_counter()
    pair()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pair()
    t_pair = time.perf_counter() - t0
    n_dev = len(jax.devices())
    print(f"# 10s NABLA NFE pair: compile+first {compile_s:.1f}s, steady "
          f"{t_pair:.1f}s (1 chip; v5e-8 projection ~{t_pair / 8:.1f}s x "
          f"50 pairs = {t_pair / 8 * 50:.0f}s vs 224s baseline). NOTE: "
          f"random weights give uniform attention, so the NABLA mask sits "
          f"at its density ceiling — this is the sparse path's WORST case; "
          f"real checkpoints measure 5-15% density (peaked attention).",
          file=sys.stderr)
    extra["10s_sft_nfe_pair_seconds"] = round(t_pair, 2)
    extra["10s_sft_v5e8_projection_seconds"] = round(t_pair / 8 * 50, 1)
    extra["10s_devices_measured"] = n_dev


def bench_nabla10s_density(extra, targets=(0.05, 0.10, 0.15, 0.20, 0.25),
                           reserve=60.0):
    """10s NFE pair vs MASK DENSITY: a 5-point sensitivity curve
    (VERDICT round-3 item 9 upgraded round-2 item 3's three anecdotes).

    Random weights give uniform attention, so the adaptive mask sits at
    its density ceiling — the sparse path's worst case. The released
    checkpoints measure ~5-15% kept density (peaked attention). This
    injects shared NablaMasks at controlled densities (banked STA union
    + a contiguous temporal slab around the diagonal — the clustered
    structure real masks have) and times the full 2-forward NFE pair
    with the mask applied in every layer, plus one measured mask+list
    build (the shared-mask mode's per-step cost). Emits the
    density -> pair-seconds table, the least-squares s/pair-vs-density
    line, and the density at which sparse crosses the measured dense
    pair — so the 10s projection reads as a function, not anecdotes.
    Each point checks the remaining wall-clock budget first."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from kandinsky5_tpu.config import DiTParams
    from kandinsky5_tpu.models.dit import (
        SparseParams,
        dit_forward,
        fast_init_dit_params,
    )
    from kandinsky5_tpu.ops.nabla import (
        NablaMask,
        block_mask_to_kv_lists,
        nabla_build_mask,
        sta_mask,
    )

    cfg = DiTParams()
    params = fast_init_dit_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    T, HL, WL = 61, 64, 96           # 10s latent grid
    tb, hb, wb = 61, 4, 6            # (T, H/8, W/8) token-block grid
    s1 = tb * hb * wb                # 1464 blocks
    q_rows = 8
    rows = s1 // q_rows
    heads = cfg.num_heads

    sta = np.asarray(sta_mask(tb, hb, wb))                 # (s1, s1)
    sta_banked = sta.reshape(rows, q_rows, s1).any(axis=1)  # (rows, s1)

    x = jnp.asarray(rng.randn(1, T, HL, WL, cfg.visual_embed_dim),
                    jnp.bfloat16)
    L = 256
    te = jnp.asarray(rng.randn(1, L, cfg.in_text_dim), jnp.bfloat16)
    pe = jnp.asarray(rng.randn(1, cfg.in_text_dim2), jnp.bfloat16)
    mask = jnp.ones((1, L), bool)
    t_arr = jnp.asarray([700.0], jnp.float32)

    # one shared-mask build at the 10s shape (the per-step serial cost)
    qs = jnp.asarray(rng.randn(1, s1 * 64, heads, cfg.head_dim) * 0.05,
                     jnp.bfloat16)
    m0 = nabla_build_mask(qs, qs, jnp.asarray(sta), q_rows=q_rows)
    _sync_scalar(m0.kv_nb.astype(jnp.float32))
    t0 = _time.perf_counter()
    m0 = nabla_build_mask(qs, qs, jnp.asarray(sta), q_rows=q_rows)
    _sync_scalar(m0.kv_nb.astype(jnp.float32))
    t_build = _time.perf_counter() - t0
    del m0, qs
    gc.collect()

    # ONE jitted forward for the whole sweep: density changes only the
    # VALUES of the mask/kv-list arrays (kv_inds is full-width with
    # active-first packing), never their shapes — so every density
    # point after the first reuses the same executable (round 4 paid
    # 129.6 s of compile and landed a single point before the budget
    # died; points after the first now cost ~1 pair each)
    sta_j = jnp.asarray(sta)

    # params passed as an ARGUMENT: closing over them captures 4 GB of
    # constants into the lowering (measured warning + slow compile)
    @jax.jit
    def fwd(p, gmask, kv_inds, kv_nb):
        shared = NablaMask(gmask, kv_inds, kv_nb, q_rows)
        sp = SparseParams(sta=sta_j, P=0.9, shared=shared)
        return dit_forward(p, cfg, x, te, pe, t_arr,
                           text_mask=mask, attn_impl="auto", sparse=sp)

    def build_mask(target):
        # block (t, h, w) row-major: a +-w-frame temporal slab is a
        # contiguous run of (2w+1)*hb*wb columns — the clustered shape
        # real adaptive masks have
        blocks_per_frame = hb * wb
        want = int(target * s1)
        g = np.zeros((rows, s1), bool)
        centers = (np.arange(rows) * q_rows + q_rows // 2)
        for r in range(rows):
            c = (centers[r] // blocks_per_frame) * blocks_per_frame
            lo = max(0, min(c - want // 2, s1 - want))
            g[r, lo:lo + want] = True
        g |= sta_banked
        density = float(g.mean())
        gmask = jnp.asarray(np.broadcast_to(g, (1, heads, rows, s1)))
        kv_inds, kv_nb = block_mask_to_kv_lists(gmask)
        return density, gmask, kv_inds, kv_nb

    def pair(margs):
        for _ in range(2):  # cond + uncond sequential forwards
            _sync_scalar(fwd(params, *margs))

    table = {}
    compiled = False
    for target in targets:
        if remaining() < reserve + (120 if not compiled else 45):
            print(f"# density point {target:.2f} skipped: "
                  f"{remaining():.0f}s budget left", file=sys.stderr)
            continue
        density, *margs = build_mask(target)
        t0 = _time.perf_counter()
        pair(margs)
        compile_s = _time.perf_counter() - t0
        if not compiled:
            # only the first point pays compile; its first run is the
            # warmup, the second the measurement
            compiled = True
            t0 = _time.perf_counter()
            pair(margs)
            t_pair = _time.perf_counter() - t0 + t_build
        else:
            t_pair = compile_s + t_build
            compile_s = 0.0
        table[f"{density:.3f}"] = round(t_pair, 2)
        print(f"# 10s pair at {density * 100:.1f}% density: "
              f"{'compile+first %.1fs, ' % compile_s if compile_s else ''}"
              f"steady {t_pair:.2f}s "
              f"(incl. {t_build:.2f}s shared mask build)", file=sys.stderr)
        gc.collect()

    if len(table) >= 2:
        # publish only a table that can also refresh the fit below: a
        # 0- or 1-point run must not clobber a carried multi-point
        # table while the carried fit (computed from the old table)
        # survives the merge — that would leave a fit whose supporting
        # points no longer exist in the artifact
        extra["10s_density_pair_seconds"] = table
    fit = None
    if len(table) >= 2:
        ds = np.array([float(k) for k in table])
        ts = np.array([table[k] for k in table])
        slope, intercept = np.polyfit(ds, ts, 1)
        fit = {"slope_s_per_density": round(float(slope), 2),
               "intercept_s": round(float(intercept), 2),
               "points": len(table)}
        extra["10s_pair_vs_density_fit"] = fit
        dense_pair = extra.get("10s_sft_nfe_pair_seconds",
                               _PRIOR.get("10s_sft_nfe_pair_seconds"))
        if dense_pair and slope > 0:
            cross = (dense_pair - intercept) / slope
            extra["10s_sparse_dense_crossover_density"] = round(
                float(cross), 3)
            print(f"# 10s pair fit: t = {intercept:.1f} + {slope:.1f} x "
                  f"density; sparse beats dense below "
                  f"{cross * 100:.0f}% density", file=sys.stderr)

    # ---- multi-pair trajectory at the estimate density (VERDICT r4
    # item 2c): 4 consecutive pairs, each paying its own shared-mask
    # build — sequential-CFG steady-state behavior, not one warm pair
    # 15% = the released checkpoints' operating-regime upper end (see
    # project_v5e8's d_est rationale; the toy proxy density is an upper
    # bound, not an estimate)
    d_est = 0.15
    if compiled and remaining() > reserve + 4.2 * (
            (fit["intercept_s"] + fit["slope_s_per_density"] * d_est)
            if fit else 25.0):
        density, *margs = build_mask(max(d_est - 0.02, 0.01))
        qs2 = jnp.asarray(rng.randn(1, s1 * 64, heads, cfg.head_dim) * 0.05,
                          jnp.bfloat16)
        traj = []
        for _ in range(4):
            t0 = _time.perf_counter()
            m_i = nabla_build_mask(qs2, qs2, sta_j, q_rows=q_rows)
            _sync_scalar(m_i.kv_nb.astype(jnp.float32))
            pair(margs)
            traj.append(round(_time.perf_counter() - t0, 2))
        extra["10s_traj_pairs_s"] = traj
        extra["10s_traj_density"] = round(density, 3)
        print(f"# 10s 4-pair trajectory at {density * 100:.1f}%: "
              f"{traj} (mean {np.mean(traj):.2f}s/pair, "
              f"mask rebuilt per pair)", file=sys.stderr)
        del qs2
    del params
    gc.collect()


def _proxy_density():
    """Trained-tiny-DiT NABLA density at P=0.9 (tools/peaked_proxy.py)
    — a measured TOY UPPER BOUND on the production density (the toy's
    attention is far less peaked than a released checkpoint's), emitted
    as context next to the 15%-regime estimate and the fail-density
    boundary. None when the proxy results file is absent."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "peaked_proxy_results.json")
    try:
        with open(path) as f:
            return float(json.load(f)["nabla_density_p90"])
    except (OSError, ValueError, KeyError):
        return None


def project_v5e8(extra, src=None):
    """Per-stage v5e-8 projection from the single-chip measurements
    (VERDICT round-2 item 5: replace the flat /8 with an auditable
    model). Emitted per stage into BENCH_EXTRA under ``v5e8_*`` keys.
    ``src`` is the MERGED measurement record (this run's keys over the
    carried-forward prior ones) so a stage skipped this run still
    anchors the projection with its prior measured value.

    Model and assumptions (all visible below):
      * DiT runs tp=8 (the parallel/sharding.py plan: column-parallel
        QKV/MLP-in, row-parallel out/MLP-down, head-parallel attention).
        Attention + linear FLOPs divide by 8 at the measured rates.
      * Each visual block all-reduces three (S, 1792) bf16 activations
        (self-attn out, cross-attn out, MLP down). Bidirectional-ring
        all-reduce cost = 2(n-1)/n x bytes / ICI_BW, ICI_BW = 9e10 B/s
        per chip (2 ICI links x 45 GB/s each way, v5e 2D torus — the
        scaling-book number).
      * Text: the Qwen decode is HBM-bandwidth-bound; the weights are
        8-way sharded by text/qwen.shard_qwen_params (mesh-parity-tested
        on the virtual 8-device mesh, tests/test_qwen_tp.py) so the
        per-token weight read divides by 8, plus a 25% latency fudge for
        the per-token collectives; encode and CLIP are too small to
        matter and are left at 1-chip cost.
      * VAE: the dp=8 temporal-tile batch of the TILED path (already
        implemented, models/vae.py:_temporal_tiled_decode) — 14 full
        tiles over 8 chips -> 2 waves of the 4-frame tile cost. The
        streaming path is faster on ONE chip but is serial in time, so
        multi-chip projection uses the tiled path.
    """
    if src is None:
        src = extra
    S, D, BLOCKS, HEADS, HD = 47616, 1792, 32, 28, 64
    N = 8
    TP, SP = 4, 2           # plan_dit_mesh(8, 28) -> tp=4 x sp=2
    ICI_BW = 9e10
    ATT_RATE = 81.1e12      # measured flash kernel rate (tools/bench_flash3)
    att_flops = BLOCKS * 4 * S * S * HD * HEADS
    att_1chip = att_flops / ATT_RATE
    # the projection's faithful path keys off the bf16 kernel; when the
    # headline ran the int8-QK default, the bf16 number is the
    # companion measurement
    nfe_1chip = src.get("denoise_bf16_s_per_nfe",
                        src.get("denoise_s_per_nfe"))
    if nfe_1chip is None:
        return
    lin_1chip = max(nfe_1chip - att_1chip, 0.0)
    # collectives under tp=4 x sp=2 (2D torus: both axes have their own
    # links): per block, 3 row-parallel all-reduces over tp of the
    # LOCAL (S/sp, D) bf16 output (ring: 2(tp-1)/tp x bytes), plus the
    # sp KV all-gather (each device receives the other slice of K and V
    # at local head width D/tp)
    ar = 3 * (2 * (TP - 1) / TP) * (S // SP * D * 2) / ICI_BW
    ag = 2 * ((SP - 1) / SP) * (S * (D // TP) * 2) / ICI_BW
    coll_per_nfe = BLOCKS * (ar + ag)
    shard_ms = src.get("shard_block_ms")
    if shard_ms:
        # measured per-shard block compute (bench_shard_compute) + the
        # measured single-chip scan/prologue residual (kept at its
        # 1-chip value — conservative) + modeled collectives
        resid = max(nfe_1chip - BLOCKS * src["full_block_ms"] / 1e3,
                    0.0)
        nfe_tp8 = BLOCKS * shard_ms / 1e3 + coll_per_nfe + resid
        extra["v5e8_residual_s_per_nfe"] = round(resid, 3)
        i8_ms = src.get("shard_block_int8_ms")
        if i8_ms:
            nfe_i8 = BLOCKS * i8_ms / 1e3 + coll_per_nfe + resid
            extra["v5e8_denoise_int8_s"] = round(16 * nfe_i8, 2)
    else:
        nfe_tp8 = att_1chip / N + lin_1chip / N + coll_per_nfe
    denoise_tp8 = 16 * nfe_tp8

    # expansion /N cites SHIPPED mesh code (VERDICT r4 item 7):
    # text/qwen.py qwen_param_specs + sharded decode, output-parity
    # tested on the virtual 8-way mesh (tests/test_qwen_tp.py); decode
    # is HBM-bound so weight-sharding divides the weight stream by N,
    # +25% for the per-layer all-reduces. Encode/CLIP stay replicated
    # at their measured 1-chip cost (the reference replicates them too)
    text_tp8 = (src.get("text_expand_s", 0.0) / N * 1.25
                + src.get("text_encode_s", 0.0)
                + src.get("clip_s", 0.0))

    # the dp projection uses the TILED path (independent temporal tiles
    # dp-batch across chips; streaming is serial in time): 14 full tiles
    # (stride 2 over 31 latent frames) in 2 waves of 8, + the ragged
    # boundary tile — ~2.2/14ths of the serial tiled cost
    vae_1chip = src.get("vae_tiled_s", src.get("vae_s", 0.0))
    vae_tp8 = vae_1chip * 2.2 / 14 if vae_1chip else 0.0

    extra["v5e8_attention_s_per_nfe"] = round(att_1chip / N, 3)
    extra["v5e8_linear_s_per_nfe"] = round(lin_1chip / N, 3)
    extra["v5e8_collectives_s_per_nfe"] = round(coll_per_nfe, 3)
    extra["v5e8_denoise_s"] = round(denoise_tp8, 2)
    extra["v5e8_text_s"] = round(text_tp8, 2)
    extra["v5e8_vae_s"] = round(vae_tp8, 2)
    extra["v5e8_e2e_s"] = round(denoise_tp8 + text_tp8 + vae_tp8, 2)
    if "v5e8_denoise_int8_s" in extra:
        extra["v5e8_e2e_int8_s"] = round(
            extra["v5e8_denoise_int8_s"] + text_tp8 + vae_tp8, 2)

    # ---- 10s SFT (100 NFE) ----
    S10 = 93696
    # same tp=4 x sp=2 mesh (query banks over sp, heads over tp)
    ar10 = 3 * (2 * (TP - 1) / TP) * (S10 // SP * D * 2) / ICI_BW
    ag10 = 2 * ((SP - 1) / SP) * (S10 * (D // TP) * 2) / ICI_BW
    coll10 = BLOCKS * (ar10 + ag10)

    def e2e_10s(pair_1chip):
        # both forwards of the pair shard over the 8 devices
        pair_tp8 = pair_1chip / N + 2 * coll10
        return pair_tp8, 50 * pair_tp8 + text_tp8 + 2 * vae_tp8

    fit = src.get("10s_pair_vs_density_fit")
    table = src.get("10s_density_pair_seconds")
    dens = _proxy_density()
    if dens is not None:
        extra["10s_proxy_density"] = round(dens, 3)
    if fit:
        # density estimate: the 15% upper end of the released
        # checkpoints' reported operating regime (NABLA top-CDF P=0.9
        # on trained video attention; reference configs/config_10s_*).
        # The trained-tiny-DiT proxy (tools/peaked_proxy.py) measures a
        # TOY UPPER BOUND on density (its 8-block model on synthetic
        # data is far less peaked than a released 2B checkpoint —
        # density falls monotonically with training, 92% random-init ->
        # 68% @400 steps) — reported alongside, never used as the
        # estimate; the explicit fail-density line below is what makes
        # the claim auditable either way.
        d_est = 0.15
        pair = fit["intercept_s"] + fit["slope_s_per_density"] * d_est
        extra["10s_pair_at_est_density_s"] = round(pair, 2)
        extra["10s_est_density"] = round(d_est, 3)
        if dens is not None:
            extra["10s_pair_at_proxy_density_s"] = round(
                fit["intercept_s"] + fit["slope_s_per_density"] * dens, 2)
        # explicit failure boundary (VERDICT r4 item 2a): the density
        # above which the 224 s baseline is missed, from the same fit
        if fit["slope_s_per_density"] > 0:
            # solve 50*(pair(d)/8 + 2*coll10) + text + 2*vae = 224
            budget_pair = (224.0 - text_tp8 - 2 * vae_tp8) / 50
            d_fail = ((budget_pair - 2 * coll10) * N
                      - fit["intercept_s"]) / fit["slope_s_per_density"]
            extra["10s_target_fail_density"] = round(float(d_fail), 3)
            print(f"# 10s target: v5e-8 meets 224 s below "
                  f"{d_fail * 100:.1f}% kept density (fit-based); "
                  f"estimate in use: {d_est * 100:.1f}%", file=sys.stderr)
    elif table:
        pair = min(table.values())
    else:
        pair = src.get("10s_sft_nfe_pair_seconds")
    if pair:
        pair_tp8, e2e = e2e_10s(pair)
        extra["v5e8_10s_pair_s"] = round(pair_tp8, 2)
        extra["v5e8_10s_e2e_s"] = round(e2e, 1)
    # ALWAYS also publish the worst case when it was ever measured, so
    # the passing estimate and the failing bound live side by side
    worst = src.get("10s_sft_nfe_pair_seconds")
    if worst:
        _, e2e_w = e2e_10s(worst)
        extra["v5e8_10s_e2e_worstcase_s"] = round(e2e_w, 1)
    def g(k):
        # a key not recomputed this run may still be carried in the
        # merged record — print the value the artifact will contain
        v = extra.get(k)
        return src.get(k) if v is None else v

    print(f"# v5e-8 projection: e2e {g('v5e8_e2e_s')}s "
          f"(denoise {g('v5e8_denoise_s')}s = 16 x "
          f"[att {g('v5e8_attention_s_per_nfe')} + lin "
          f"{g('v5e8_linear_s_per_nfe')} + coll "
          f"{g('v5e8_collectives_s_per_nfe')}], text "
          f"{g('v5e8_text_s')}s, vae {g('v5e8_vae_s')}s); "
          f"10s e2e {g('v5e8_10s_e2e_s')}s "
          f"(worst-case {g('v5e8_10s_e2e_worstcase_s')}s)",
          file=sys.stderr)


def emit_sol_fractions(extra, src=None):
    """Speed-of-light fractions: measured stage time vs its analytic
    hardware floor (tools/roofline.py — MXU rate or HBM bandwidth,
    whichever walls the stage). Recorded so the driver sees not just
    the seconds but how much of each stage's remaining gap is physics
    vs engineering."""
    import importlib.util

    if src is None:
        src = extra
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "roofline.py")
    spec = importlib.util.spec_from_file_location("k5_roofline", path)
    rf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rf)
    dn = rf.denoise_rooflines()
    vae = rf.vae_decoder_roofline()
    txt = rf.text_rooflines()

    def frac(floor, key):
        m = src.get(key)
        return round(floor / m, 3) if m else None

    impl = src.get("denoise_attn_impl", "auto")
    dn_floor = (dn["floor_int8qk_s_per_nfe"] if impl == "flash_int8"
                else dn["floor_bf16_s_per_nfe"]) * rf.NFE
    dn_ach = (dn["achievable_int8qk_s_per_nfe"] if impl == "flash_int8"
              else dn["achievable_bf16_s_per_nfe"]) * rf.NFE
    out = {
        "sol_denoise": frac(dn_floor, "denoise_s"),
        "sol_denoise_bf16": frac(dn["floor_bf16_s_per_nfe"] * rf.NFE,
                                 "denoise_bf16_s"),
        "sol_vae_stream": frac(vae["floor_s"], "vae_s"),
        "sol_text_expand": frac(txt["expand_floor_s"], "text_expand_s"),
        # fraction of the ACHIEVABLE ceiling (measured v5e MXU rates +
        # measured conv-tower sustained rate, tools/roofline.py) — the
        # spec-peak floors above are unreachable by construction; these
        # say how much of the reachable gap remains
        "sol_denoise_achievable": frac(dn_ach, "denoise_s"),
        "sol_vae_achievable": frac(vae["achievable_s"], "vae_s"),
    }
    extra.update({k: v for k, v in out.items() if v is not None})


# --------------------------------------------------------------------------
# Harness
# --------------------------------------------------------------------------

def _dump_extra(extra):
    try:
        with open("BENCH_EXTRA.json", "w") as f:
            json.dump(merged_extra(extra), f, indent=1)
            f.write("\n")
    except OSError:
        pass


def _headline(total):
    return json.dumps({
        "metric": "5s_distill16_e2e_seconds",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(total / BASELINE_5S, 3),
    })


_STATE = {"total": None, "extra": None}


def _sigterm_handler(signum, frame):
    """External timeout backstop: flush what we have and exit cleanly."""
    if _STATE["total"] is not None:
        _dump_extra(_STATE["extra"])
        print(_headline(_STATE["total"]), flush=True)
        print("# SIGTERM: flushed headline + BENCH_EXTRA, exiting",
              file=sys.stderr)
        os._exit(0)
    print("# SIGTERM before core stages finished", file=sys.stderr)
    os._exit(1)


def _extra_stage(name, est_s, fn, extra, *args, **kwargs):
    """Run an optional stage iff it fits the remaining budget; always
    re-dump BENCH_EXTRA afterwards so a kill loses at most one stage.
    Records each stage's actual wall cost (``extras_cost_s``) so the
    estimates stay honest — the first budgeted run overran 1500 s by
    202 s because the estimates were ~2x low."""
    if remaining() < est_s:
        print(f"# extra [{name}] skipped: {remaining():.0f}s left < "
              f"{est_s:.0f}s estimate", file=sys.stderr)
        extra.setdefault("extras_skipped", []).append(name)
        return
    t0 = time.perf_counter()
    try:
        fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001
        print(f"# extra [{name}] failed: {type(e).__name__}: {e}"[:200],
              file=sys.stderr)
        extra.setdefault("extras_failed", []).append(name)
        gc.collect()
    extra.setdefault("extras_cost_s", {})[name] = round(
        time.perf_counter() - t0, 1)
    _dump_extra(extra)


def main():
    if "--text-stage" in sys.argv:
        _text_stage_main(sys.argv[sys.argv.index("--text-stage") + 1])
        return

    import kandinsky5_tpu  # noqa: F401  enables the persistent compile cache

    _install_compile_monitor()
    _load_prior_extra()
    signal.signal(signal.SIGTERM, _sigterm_handler)

    if "--budget" in sys.argv:
        _BUDGET[0] = float(sys.argv[sys.argv.index("--budget") + 1])
    else:
        _BUDGET[0] = float(os.environ.get("KANDINSKY5_TPU_BENCH_BUDGET",
                                          1500.0))
    quick = "--quick" in sys.argv
    extra = {"budget_s": _BUDGET[0]}

    # ---- core stages: text (subprocess) -> denoise -> VAE ----
    t_text = 0.0
    if not quick and "--no-text" not in sys.argv:
        # leave at least 500 s for denoise+VAE (service-cold estimates:
        # denoise compile ~120 + steady ~100, VAE ~30 + ~30, margin)
        slice_s = min(remaining() - 500, 900)
        if slice_s > 120:
            t_text = bench_text_subprocess(extra, slice_s)
        else:
            extra["text_stage"] = "skipped (budget)"
            print("# text stage skipped: budget", file=sys.stderr)

    t_denoise, latents, meta = bench_denoise(quick, extra)

    t_vae = 0.0
    if not quick:
        try:
            t_vae = bench_vae(latents, extra)
        except Exception as e:  # noqa: BLE001
            print(f"# vae stage failed: {type(e).__name__}: {e}"[:200],
                  file=sys.stderr)
            gc.collect()

    # ---- HEADLINE: emitted before any extra can burn the clock ----
    total = t_text + t_denoise + t_vae
    extra["elapsed_at_headline_s"] = round(time.perf_counter() - _T0, 1)
    _STATE.update(total=total, extra=extra)
    _dump_extra(extra)
    print(_headline(total), flush=True)
    if quick:
        return

    # ---- budgeted extras, highest-value first ----
    # estimates are MEASURED stage costs (extras_cost_s of prior runs).
    # Round-5 order (VERDICT r4 item 1b): the stages the final scorecard
    # MUST contain from one run come first — untiled-VAE fidelity probe,
    # shard anchors, the density sweep (jit-once: extra points are ~1
    # pair each), the FIXED vae_int8 A/B — then the magcache timing and
    # the SHORT bf16 A/B (the full 16-step bf16 question was settled in
    # r4; its value carries forward via the merge). Skipped stages no
    # longer lose data: _dump_extra merges with the on-disk record.
    _extra_stage("vae_probe", 280, bench_vae_probe, extra, latents, extra)
    _extra_stage("shard_compute", 220, bench_shard_compute, extra, extra)
    if "--no-nabla10s" not in sys.argv:
        # 430 = measured setup (params + 2 mask builds, ~150 s) + first
        # point compile (~120 s) + per-point reserve — the r5 rehearsal
        # entered at 304 s, burned the setup, then had to skip every
        # point; entering without room for the first point is pure waste
        _extra_stage("nabla10s_density", 430, bench_nabla10s_density,
                     extra, extra)
    _extra_stage("vae_int8", 240, bench_vae_int8, extra, latents, extra)
    _extra_stage("magcache", 320, bench_magcache, extra, extra)
    _extra_stage("bf16_faithful", 340, bench_denoise_faithful, extra,
                 quick, extra, latents, budget_all_int8=200)
    if "--no-nabla10s" not in sys.argv:
        _extra_stage("nabla10s_worst", 170, bench_nabla10s, extra, extra)
    del latents
    gc.collect()
    # host-side arithmetic over the MERGED record (this run's numbers
    # over carried-forward prior ones — a stage skipped this run still
    # anchors the projection with its prior measured value); run
    # UNCONDITIONALLY so BENCH_EXTRA always carries the projection and
    # speed-of-light keys even when the device extras blew the budget
    src = merged_extra(extra)
    for name, fn in (("project_v5e8", project_v5e8),
                     ("sol_fractions", emit_sol_fractions)):
        try:
            fn(extra, src)
        except Exception as e:  # noqa: BLE001
            print(f"# extra [{name}] failed: {type(e).__name__}: {e}"[:200],
                  file=sys.stderr)
            extra.setdefault("extras_failed", []).append(name)
    extra["elapsed_total_s"] = round(time.perf_counter() - _T0, 1)
    _dump_extra(extra)
    # re-print so the headline is also the LAST line of stdout
    print(_headline(total), flush=True)


if __name__ == "__main__":
    main()
