"""Kandinsky-5 T2V Lite, TPU-native (JAX / XLA / Pallas / pjit).

A from-scratch re-design of ai-forever/Kandinsky-5 for TPUs. See
SURVEY.md for the structural map of the reference and README.md for the
framework overview.
"""

from kandinsky5_tpu.utils import cache as _cache  # noqa: F401  (side effect)
from kandinsky5_tpu.config import Config, get_default_conf, load_config

__all__ = ["Config", "get_default_conf", "load_config", "get_T2V_pipeline"]
__version__ = "0.1.0"


def get_T2V_pipeline(*args, **kwargs):
    from kandinsky5_tpu.pipeline import get_T2V_pipeline as _f

    return _f(*args, **kwargs)
