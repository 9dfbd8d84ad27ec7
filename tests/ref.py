"""Load the PyTorch reference (read-only at /root/reference) on CPU for
golden-parity tests.

The reference assumes CUDA at import time (flash-attn probe at
kandinsky/models/nn.py:9) and bf16 autocast at run time. For tight
numerical comparison we run BOTH sides in float32:

  * ``torch.cuda.get_device_capability`` is stubbed before import;
  * the three bf16-casting helpers (nn.py:25-40) are replaced with
    float32-preserving versions of the same math;
  * the missing ``flash_attn`` kernel is replaced with torch SDPA.

This file only *executes* reference code for test oracles; the framework
itself never imports from /root/reference.
"""

import os
import sys
import types

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")

import torch

_REF = "/root/reference"


def load_reference_models():
    """Import kandinsky.models.{nn,dit,utils} from the reference without
    triggering its package __init__ (which needs omegaconf/diffusers)."""
    if "kandinsky.models.dit" in sys.modules:
        import kandinsky.models.dit as rdit
        import kandinsky.models.nn as rnn
        import kandinsky.models.utils as rutils

        return rnn, rdit, rutils

    torch.cuda.get_device_capability = lambda *a, **k: (0, 0)
    pkg = types.ModuleType("kandinsky")
    pkg.__path__ = [os.path.join(_REF, "kandinsky")]
    sys.modules["kandinsky"] = pkg
    mpkg = types.ModuleType("kandinsky.models")
    mpkg.__path__ = [os.path.join(_REF, "kandinsky", "models")]
    sys.modules["kandinsky.models"] = mpkg

    import kandinsky.models.dit as rdit
    import kandinsky.models.nn as rnn
    import kandinsky.models.utils as rutils

    # float32-preserving stand-ins for the bf16-casting autocast helpers
    def apply_scale_shift_norm(norm, x, scale, shift):
        return (norm(x.float()) * (scale + 1.0) + shift).float()

    def apply_gate_sum(x, out, gate):
        return (x.float() + gate.float() * out.float()).float()

    def apply_rotary(x, rope):
        x_ = x.reshape(*x.shape[:-1], -1, 1, 2).to(torch.float32)
        return (rope * x_).sum(dim=-1).reshape(*x.shape).float()

    def fa(q, k, v):
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2).float(), k.transpose(1, 2).float(),
            v.transpose(1, 2).float()
        )
        return o.transpose(1, 2)

    for mod in (rnn, rdit):
        mod.apply_scale_shift_norm = apply_scale_shift_norm
        mod.apply_gate_sum = apply_gate_sum
    rnn.apply_rotary = apply_rotary
    rnn.FA = fa
    return rnn, rdit, rutils


TINY = dict(
    in_visual_dim=4,
    out_visual_dim=4,
    time_dim=32,
    patch_size=[1, 2, 2],
    model_dim=64,
    ff_dim=128,
    num_text_blocks=2,
    num_visual_blocks=3,
    axes_dims=[8, 4, 4],
    visual_cond=False,
    in_text_dim=48,
    in_text_dim2=24,
)

TINY_COND = dict(TINY, visual_cond=True)


def torch_state_to_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
