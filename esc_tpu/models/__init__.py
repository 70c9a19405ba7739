"""Codec models (mirrors esc/models/__init__.py exports)."""

from .codecs import ESC, RVQCodecs, ESCModule, RVQModule, make_model, model_dict
from .discriminator import Discriminator

__all__ = ["ESC", "RVQCodecs", "ESCModule", "RVQModule", "make_model",
           "model_dict", "Discriminator"]
