"""Real-weight rehearsal: the FULL parity_check flow, executable today.

The >35 dB fidelity gate (BASELINE.md) needs released checkpoints this
environment cannot download. This tool rehearses the exact same flow at
a tiny-but-structurally-complete configuration against the CPU torch
reference, so day-1 with real weights is a config change, not a
debugging session:

  1. instantiate tiny torch models of all four families — the reference
     DiT (reference kandinsky/models/dit.py via tests/ref.py), the
     reference HunyuanVideo VAE (reference vae.py via
     tests/diffusers_stub.py), an HF Qwen2.5-VL and an HF CLIPTextModel
     — plus a REAL trained BPE tokenizer fixture and a
     generation_config.json;
  2. save them as HF-layout checkpoint directories / safetensors files
     (the released download layout, reference kandinsky/utils.py:59-87);
  3. run the reference generation semantics on torch CPU (template
     encode with crop, flow-matching generate, VAE decode, uint8) and
     capture a parity dump (same keys as parity_check
     --make-reference-dump);
  4. build OUR pipeline through the production factory
     (pipeline.get_T2V_pipeline(conf_path=...) — safetensors load, key
     conversion, config.json-driven model dims, tokenizer load) and run
     the gate: tools/parity_check.run_ours (faithful bf16+tiled paths,
     fast-default deltas as secondary numbers).

One command, one PSNR number, through the code path real checkpoints
take:

    python tools/parity_selftest.py [--workdir DIR] [--steps 4]

The reference's text encode is reproduced at the semantic level
(template/crop/hidden_states[-1], reference text_embedders.py:70-95)
with direct HF model calls — the reference class itself hard-requires
flash-attention + CUDA. DiT, sampler and VAE run the reference's own
code.
"""

import argparse
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PROMPT = "A dog in a red hat runs across the meadow"
NEGATIVE = "Static, low quality"

# tiny-but-complete dims; head_dim 16, model_dim 64 -> 4 heads
TINY_DIT = dict(
    in_visual_dim=4, out_visual_dim=4, time_dim=32, patch_size=[1, 2, 2],
    model_dim=64, ff_dim=128, num_text_blocks=2, num_visual_blocks=3,
    axes_dims=[8, 4, 4], visual_cond=True, in_text_dim=64, in_text_dim2=64,
)
QWEN_DIMS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                 num_attention_heads=4, num_key_value_heads=2)
CLIP_DIMS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                 num_attention_heads=2, max_position_embeddings=77)
# GroupNorm in the reference VAE uses 32 groups — channels must divide
VAE_DIMS = dict(in_channels=3, out_channels=3, latent_channels=4,
                block_out_channels=(32, 32, 32, 32), layers_per_block=2)
MAX_LEN_QWEN = 32
MAX_LEN_CLIP = 16


def make_qwen_tokenizer(qwen_dir):
    """A real trained byte-level BPE (tokenizers lib) over the release's
    conditioning templates, so the template tokenizes to roughly the
    released crop scale; saved in the HF fast-tokenizer layout our
    embedder loads with AutoTokenizer (text/embedder.py:107)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from tokenizers.trainers import BpeTrainer
    from transformers import PreTrainedTokenizerFast

    from kandinsky5_tpu.text.embedder import (
        EXPAND_INSTRUCTION,
        PROMPT_TEMPLATE,
    )

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    corpus = ["\n".join(PROMPT_TEMPLATE["video"]),
              "\n".join(PROMPT_TEMPLATE["image"]),
              EXPAND_INSTRUCTION, PROMPT, NEGATIVE]
    trainer = BpeTrainer(
        vocab_size=560, show_progress=False,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(corpus, trainer)
    hf = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="<|im_end|>",
        pad_token="<|endoftext|>",
        additional_special_tokens=["<|im_start|>"])
    hf.save_pretrained(qwen_dir)
    return hf


def make_clip_tokenizer(clip_dir, vocab_size):
    """CLIPTokenizer-format fixture (vocab.json + merges.txt): the byte
    alphabet + end-of-word variants, empty merges — character-level BPE.
    The EOT token gets the LARGEST id, which the pooling path relies on
    (text/clip.py: pooled at argmax id)."""
    import json

    from transformers import CLIPTokenizer
    from transformers.models.clip.tokenization_clip import bytes_to_unicode

    bs = list(bytes_to_unicode().values())
    tokens = bs + [b + "</w>" for b in bs] + ["<|startoftext|>",
                                              "<|endoftext|>"]
    assert len(tokens) <= vocab_size
    vocab = {t: i for i, t in enumerate(tokens)}
    os.makedirs(clip_dir, exist_ok=True)
    with open(os.path.join(clip_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(clip_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = CLIPTokenizer.from_pretrained(clip_dir)
    # write tokenizer_config.json (tokenizer_class) so AutoTokenizer
    # resolves the class without consulting the model config —
    # CLIPTextConfig alone has no AutoTokenizer mapping
    tok.save_pretrained(clip_dir)
    return tok


def build_checkpoints(workdir, seed=0):
    """Instantiate + save all four model families in the released
    download layout. Returns the torch models for the reference run."""
    import torch

    from safetensors.torch import save_file

    sys.path.insert(0, os.path.join(_REPO, "tests"))
    import diffusers_stub
    from ref import load_reference_models

    torch.manual_seed(seed)
    qwen_dir = os.path.join(workdir, "text_encoder")
    clip_dir = os.path.join(workdir, "text_encoder2")
    vae_dir = os.path.join(workdir, "vae")
    dit_path = os.path.join(workdir, "dit.safetensors")
    os.makedirs(vae_dir, exist_ok=True)

    # --- Qwen2.5-VL (HF) + tokenizer + generation_config ---
    qwen_tok = make_qwen_tokenizer(qwen_dir)
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )

    vocab = len(qwen_tok)
    qcfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=vocab, hidden_act="silu",
            max_position_embeddings=2048, rms_norm_eps=1e-6,
            rope_theta=1000000.0, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            **QWEN_DIMS),
        vision_config=dict(
            depth=1, hidden_size=32, intermediate_size=32, num_heads=2,
            in_channels=3, patch_size=14, spatial_merge_size=2,
            temporal_patch_size=2, out_hidden_size=64,
            fullatt_block_indexes=[]),
    )
    qwen = Qwen2_5_VLForConditionalGeneration(qcfg).eval()
    qwen.save_pretrained(qwen_dir, safe_serialization=True)
    qwen.generation_config.do_sample = False
    qwen.generation_config.save_pretrained(qwen_dir)

    # --- CLIP text model (HF) + tokenizer ---
    from transformers import CLIPTextConfig, CLIPTextModel

    clip_tok = make_clip_tokenizer(clip_dir, vocab_size=600)
    # real token ids in the config so the HF (and our) eos-based pooling
    # finds the actual EOT position (the released ViT-L/14 instead ships
    # the legacy eos_token_id=2 -> argmax pooling; both paths covered by
    # tests/test_text_encoders.py)
    ccfg = CLIPTextConfig(
        vocab_size=len(clip_tok.get_vocab()),
        bos_token_id=clip_tok.bos_token_id,
        eos_token_id=clip_tok.eos_token_id,
        pad_token_id=clip_tok.pad_token_id, **CLIP_DIMS)
    clip = CLIPTextModel(ccfg).eval()
    clip.save_pretrained(clip_dir, safe_serialization=True)

    # --- HunyuanVideo VAE (reference code) ---
    diffusers_stub.install()
    load_reference_models()
    import kandinsky.models.vae as rvae

    vae = rvae.AutoencoderKLHunyuanVideo(**VAE_DIMS).eval()
    save_file({k: v.contiguous() for k, v in vae.state_dict().items()},
              os.path.join(vae_dir, "diffusion_pytorch_model.safetensors"))

    # --- DiT (reference code) ---
    _, rdit, _ = load_reference_models()
    dit = rdit.get_dit(dict(TINY_DIT)).eval()
    with torch.no_grad():
        # zero-init modulation makes every block an identity; randomize
        # so conditioning actually participates
        for name, p in dit.named_parameters():
            if "modulation" in name:
                p.copy_(torch.randn_like(p) * 0.02)
    save_file({k: v.contiguous() for k, v in dit.state_dict().items()},
              dit_path)

    return dict(qwen=qwen, qwen_tok=qwen_tok, clip=clip,
                clip_tok=clip_tok, vae=vae, dit=dit)


#: NABLA rehearsal in the EXACT-parity configuration: q_rows=1 +
#: sort thresholding + no density cap reproduce the reference's
#: flex/BlockMask semantics (models/utils.py:136-163) through the
#: production config path; wT/wH/wW sized for the tiny token grid.
NABLA_ATTENTION = {"type": "nabla", "P": 0.9, "wT": 3, "wH": 3, "wW": 3,
                   "add_sta": True, "q_rows": 1,
                   "threshold_method": "sort", "max_density": None}
#: MagCache rehearsal ratios: near-1 ratios so the calibrated decision
#: chain (magcache_utils.py:64-87) actually produces skips at tiny step
#: counts (interpolation handles the length mismatch, both sides).
MAGCACHE_RATIOS = [1.0 + 0.002 * ((i % 5) - 2) for i in range(20)]


def write_config(workdir, steps, guidance, attention=None, magcache=None,
                 name="config.yaml"):
    import yaml

    conf = {
        "model": {
            "checkpoint_path": os.path.join(workdir, "dit.safetensors"),
            "vae": {"checkpoint_path": os.path.join(workdir, "vae"),
                    "name": "hunyuan"},
            "text_embedder": {
                "qwen": {"checkpoint_path": os.path.join(workdir,
                                                         "text_encoder"),
                         "emb_size": TINY_DIT["in_text_dim"],
                         "max_length": MAX_LEN_QWEN},
                "clip": {"checkpoint_path": os.path.join(workdir,
                                                         "text_encoder2"),
                         "emb_size": TINY_DIT["in_text_dim2"],
                         "max_length": MAX_LEN_CLIP},
            },
            "dit_params": dict(TINY_DIT),
            "attention": dict(attention) if attention else {"type": "flash"},
            "num_steps": steps,
            "guidance_weight": guidance,
        },
        "metrics": {"scale_factor": [1.0, 2.0, 2.0], "resolution": 512},
    }
    if magcache:
        conf["magcache"] = {"mag_ratios": list(magcache)}
    path = os.path.join(workdir, name)
    with open(path, "w") as f:
        yaml.safe_dump(conf, f)
    return path


def _encode_reference(models, texts, type_of_content, max_length):
    """Reference Qwen encode semantics (text_embedders.py:70-95): fixed
    template, crop_start, hidden_states[-1], varlen mask-select — via
    direct HF calls (the reference class hard-requires flash-attn)."""
    import torch

    from kandinsky5_tpu.text.embedder import CROP_START, PROMPT_TEMPLATE

    template = "\n".join(PROMPT_TEMPLATE[type_of_content])
    crop = CROP_START[type_of_content]
    full = [template.format(t) for t in texts]
    enc = models["qwen_tok"](full, max_length=max_length + crop,
                             truncation=True, padding="max_length",
                             return_tensors="pt")
    with torch.no_grad():
        out = models["qwen"](input_ids=enc["input_ids"],
                             attention_mask=enc["attention_mask"],
                             return_dict=True, output_hidden_states=True)
    embeds = out["hidden_states"][-1][:, crop:]
    mask = enc["attention_mask"][:, crop:]
    varlen = embeds[mask.bool()]
    cu = torch.cumsum(mask.sum(1), dim=0)
    cu = torch.cat([torch.zeros_like(cu)[:1], cu]).to(torch.int32)

    cenc = models["clip_tok"](texts, max_length=MAX_LEN_CLIP,
                              truncation=True, add_special_tokens=True,
                              padding="max_length", return_tensors="pt")
    with torch.no_grad():
        pooled = models["clip"](**cenc)["pooler_output"]
    return {"text_embeds": varlen, "pooled_embed": pooled}, cu


def reference_dump(models, shape, steps, guidance, seed, attention=None,
                   magcache=None):
    """Run the reference generation pipeline (its own generate + VAE
    decode code) on torch CPU, capturing the parity_check dump keys.

    ``attention`` (dict) overrides the conf attention block —
    type "nabla" exercises the reference's flex/BlockMask sparse path
    (get_sparse_params, generation_utils.py:10-36). ``magcache``
    (ratio list) installs the reference's patched magcache_forward
    (magcache_utils.py:16-37) for the run, restored afterwards."""
    import torch

    import kandinsky.generation_utils as rgen

    embeds, cu = _encode_reference(models, [PROMPT], "video", MAX_LEN_QWEN)
    nembeds, ncu = _encode_reference(models, [NEGATIVE], "video",
                                     MAX_LEN_QWEN)

    T, H, W, C = shape
    conf_ns = _ns({
        "model": {"dit_params": {"patch_size": TINY_DIT["patch_size"]},
                  "attention": dict(attention) if attention
                  else {"type": "flash"}},
        "metrics": {"scale_factor": (1.0, 2.0, 2.0)},
    })
    # rope positions follow generate_sample (generation_utils.py:173-179)
    visual_rope_pos = [
        torch.arange(T), torch.arange(H // 2), torch.arange(W // 2)]
    text_rope_pos = torch.arange(int(cu[-1]))
    null_text_rope_pos = torch.arange(int(ncu[-1]))

    dit = models["dit"]
    orig_forward = None
    if magcache:
        import kandinsky.magcache_utils as rmag

        orig_forward = type(dit).forward
        rmag.set_magcache_params(dit, list(magcache), steps,
                                 no_cfg=abs(guidance - 1.0) <= 1e-6)

    # the reference draws noise on a CUDA Generator
    # (generation_utils.py:97-99); run it on CPU and capture the draw
    real_gen = torch.Generator
    torch.Generator = lambda device=None: real_gen("cpu")
    try:
        g = real_gen("cpu")
        g.manual_seed(seed)
        noise = torch.randn(*shape, generator=g)
        with torch.no_grad():
            latents = rgen.generate(
                dit, "cpu", shape, steps, embeds, nembeds,
                visual_rope_pos, text_rope_pos, null_text_rope_pos,
                guidance, 5.0, conf_ns, seed=seed, progress=False)
    finally:
        torch.Generator = real_gen
        if orig_forward is not None:
            type(dit).forward = orig_forward

    # VAE decode exactly as generate_sample (generation_utils.py:210-222)
    vae = models["vae"]
    with torch.no_grad():
        imgs = latents.reshape(1, -1, *latents.shape[-3:])
        imgs = (imgs / vae.config.scaling_factor).permute(0, 4, 1, 2, 3)
        imgs = vae.decode(imgs).sample
        imgs = ((imgs.clamp(-1.0, 1.0) + 1.0) * 127.5).to(torch.uint8)
    frames = imgs.permute(0, 2, 3, 4, 1).numpy()  # NCTHW -> NTHWC

    return {
        "noise": noise.numpy().astype(np.float32),
        "latents": latents.float().numpy(),
        "frames": frames,
        "cond_text_embeds": embeds["text_embeds"].float().numpy(),
        "cond_pooled_embed": embeds["pooled_embed"].float().numpy(),
        "cond_cu_seqlens": cu.numpy(),
        "prompt": np.asarray(PROMPT),
        "negative": np.asarray(NEGATIVE),
        "seed": np.asarray(seed),
    }


def _ns(d):
    import types

    if isinstance(d, dict):
        return types.SimpleNamespace(**{k: _ns(v) for k, v in d.items()})
    return d


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/k5_parity_selftest")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--guidance", type=float, default=5.0)
    p.add_argument("--frames", type=int, default=3,
                   help="latent frames (pixel frames = 4x-3)")
    p.add_argument("--size", type=int, default=8,
                   help="latent H=W (pixels = 8x)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--modes", default="flash,nabla,magcache",
                   help="comma list of mechanisms to rehearse: flash "
                        "(dense 5s path), nabla (10s sparse path, exact "
                        "q_rows=1/sort semantics), magcache (calibrated "
                        "skip schedule vs the reference's patched "
                        "forward) — together they cover every mechanism "
                        "the 8 released configs select")
    p.add_argument("--dump-out", default=None,
                   help="also save the reference dump(s) as npz (a "
                        "-<mode> suffix is added beyond the first)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch/JAX side by side
    import jax.numpy as jnp

    os.makedirs(args.workdir, exist_ok=True)
    print(f"[1/4] building tiny checkpoints in {args.workdir}")
    models = build_checkpoints(args.workdir, seed=args.seed)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "k5_parity_check", os.path.join(_REPO, "tools", "parity_check.py"))
    pc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pc)

    from kandinsky5_tpu.pipeline import get_T2V_pipeline

    scores = {}
    for mode in [m.strip() for m in args.modes.split(",") if m.strip()]:
        attention = magr = None
        steps = args.steps
        shape = (args.frames, args.size, args.size,
                 TINY_DIT["in_visual_dim"])
        if mode == "nabla":
            attention = NABLA_ATTENTION
            # NABLA needs an 8-divisible token grid: latent 16x16 with
            # patch 2x2 -> (T, 8, 8) tokens, 64-token blocks = fractal
            # (1, 8, 8) tiles
            shape = (4, 16, 16, TINY_DIT["in_visual_dim"])
        elif mode == "magcache":
            magr = MAGCACHE_RATIOS
            # warmup = int(2*steps*0.2) must cover >= 1 full step so the
            # reference's residual_cache is populated before the first
            # skip (its first-skip-on-empty-cache is a None deref; real
            # configs sit far past this with 50 steps x 0.2)
            steps = max(steps, 5)
        elif mode != "flash":
            p.error(f"unknown mode {mode}")

        conf_path = write_config(args.workdir, steps, args.guidance,
                                 attention=attention, magcache=magr,
                                 name=f"config_{mode}.yaml")
        print(f"[2/4] ({mode}) reference run (torch CPU), latent shape "
              f"{shape}, {steps} steps")
        dump = reference_dump(models, shape, steps, args.guidance,
                              args.seed, attention=attention, magcache=magr)
        if args.dump_out:
            out = (args.dump_out if not scores else
                   args.dump_out.replace(".npz", f"-{mode}.npz"))
            np.savez_compressed(out, **dump)

        print(f"[3/4] ({mode}) building OUR pipeline via the production "
              f"factory")
        pipe = get_T2V_pipeline(conf_path=conf_path, dtype=jnp.float32)
        # sanity: config.json-driven dims reached the embedder
        assert (pipe.text_embedder.qwen_cfg.hidden_size
                == QWEN_DIMS["hidden_size"])
        assert (pipe.text_embedder.clip_cfg.hidden_size
                == CLIP_DIMS["hidden_size"])
        if mode == "nabla":
            assert pipe.conf.model.attention.type == "nabla"
        mag = pipe.conf.magcache if magr else None
        if magr:
            assert mag is not None and len(mag.mag_ratios) > 0

        print(f"[4/4] ({mode}) running the parity gate "
              f"(tools/parity_check.run_ours)")
        scores[mode] = pc.run_ours(conf_path, dump, PROMPT, pipe=pipe,
                                   magcache=mag)

    ok = all(s > 35.0 for s in scores.values())
    for mode, s in scores.items():
        print(f"SELFTEST[{mode}] {'PASS' if s > 35.0 else 'FAIL'}: "
              f"decoded-frame PSNR {s:.2f} dB (gate > 35)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
