"""Minimal stand-ins for the diffusers pieces the reference VAE imports.

diffusers is not installed in this environment; the reference's vendored
vae.py (/root/reference/kandinsky/models/vae.py:9-18) only needs a few
base classes plus the ``Attention`` block. These stubs implement the
exact semantics of those pieces for the configuration the VAE uses
(single head, group-norm, residual connection, upcast softmax) so the
reference model can run on CPU as the parity oracle.
"""

import sys
import types
from dataclasses import dataclass

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConfigMixin:
    pass


def register_to_config(init):
    def wrapped(self, *args, **kwargs):
        import inspect

        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        conf = {k: v for k, v in bound.arguments.items() if k != "self"}
        self.config = types.SimpleNamespace(**conf)
        return init(self, *args, **kwargs)

    return wrapped


def apply_forward_hook(fn):
    return fn


def get_activation(name):
    assert name in ("silu", "swish")
    return nn.SiLU()


class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention for the VAE
    mid-block configuration: heads = channels // dim_head (= 1 here),
    group_norm, bias=True, residual_connection=True, upcast softmax."""

    def __init__(self, query_dim, heads=8, dim_head=64, eps=1e-5,
                 norm_num_groups=None, residual_connection=False, bias=False,
                 upcast_softmax=False, _from_deprecated_attn_block=False):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.residual_connection = residual_connection
        inner = heads * dim_head
        self.group_norm = (
            nn.GroupNorm(norm_num_groups, query_dim, eps=eps, affine=True)
            if norm_num_groups is not None else None
        )
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(query_dim, inner, bias=bias)
        self.to_v = nn.Linear(query_dim, inner, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim, bias=True),
                                     nn.Dropout(0.0)])

    def forward(self, hidden_states, attention_mask=None):
        residual = hidden_states
        b, l, c = hidden_states.shape
        if self.group_norm is not None:
            hidden_states = self.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        q = self.to_q(hidden_states)
        k = self.to_k(hidden_states)
        v = self.to_v(hidden_states)
        q = q.view(b, l, self.heads, self.dim_head).transpose(1, 2)
        k = k.view(b, l, self.heads, self.dim_head).transpose(1, 2)
        v = v.view(b, l, self.heads, self.dim_head).transpose(1, 2)
        if attention_mask is not None:
            attention_mask = attention_mask.view(b, 1, *attention_mask.shape[1:])
        out = F.scaled_dot_product_attention(
            q.float(), k.float(), v.float(),
            attn_mask=None if attention_mask is None else attention_mask.float(),
        ).to(v.dtype)
        out = out.transpose(1, 2).reshape(b, l, -1)
        out = self.to_out[0](out)
        out = self.to_out[1](out)
        if self.residual_connection:
            out = out + residual
        return out


@dataclass
class AutoencoderKLOutput:
    latent_dist: object


@dataclass
class DecoderOutput:
    sample: torch.Tensor


class DiagonalGaussianDistribution:
    def __init__(self, parameters):
        self.parameters = parameters
        self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.std = torch.exp(0.5 * self.logvar)

    def sample(self, generator=None):
        noise = torch.randn(self.mean.shape, generator=generator,
                            dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self):
        return self.mean


class ModelMixin(nn.Module):
    pass


def install():
    """Register stub modules under the diffusers namespace."""
    if "diffusers" in sys.modules:
        return

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    d = mod("diffusers")
    d.configuration_utils = mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin, register_to_config=register_to_config)
    mod("diffusers.utils")
    mod("diffusers.utils.accelerate_utils", apply_forward_hook=apply_forward_hook)
    mod("diffusers.models")
    mod("diffusers.models.activations", get_activation=get_activation)
    mod("diffusers.models.attention_processor", Attention=Attention)
    mod("diffusers.models.modeling_outputs", AutoencoderKLOutput=AutoencoderKLOutput)
    mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    mod("diffusers.models.autoencoders")
    mod("diffusers.models.autoencoders.vae",
        DecoderOutput=DecoderOutput,
        DiagonalGaussianDistribution=DiagonalGaussianDistribution)
