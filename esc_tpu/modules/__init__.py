"""Neural module library (mirrors esc/modules/__init__.py exports)."""

from .transformer import TransformerLayer, SwinBlock, WindowAttention, FeedForward
from .scale import PatchEmbed, PatchDeEmbed, PatchMerge, PatchSplit
from .vq import (Codebook, ProductVectorQuantize, ResidualVectorQuantize,
                 ProductResidualVectorQuantize)
from .losses import MelSpectrogramLoss, ComplexSTFTLoss
from .gan_loss import GANLoss, discriminator_loss, generator_loss
from .convolution import ConvolutionLayer, Convolution2D

__all__ = [
    "TransformerLayer", "SwinBlock", "WindowAttention", "FeedForward",
    "PatchEmbed", "PatchDeEmbed", "PatchMerge", "PatchSplit",
    "Codebook", "ProductVectorQuantize", "ResidualVectorQuantize",
    "ProductResidualVectorQuantize",
    "MelSpectrogramLoss", "ComplexSTFTLoss",
    "GANLoss", "discriminator_loss", "generator_loss",
    "ConvolutionLayer", "Convolution2D",
]
