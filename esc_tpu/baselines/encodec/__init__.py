"""tpu-native EnCodec 24 kHz (comparison baseline).

Replaces the reference's pip-package wrapper
(baselines/descript/dac/compare/encodec.py) with a real in-repo
implementation; released torch weights load via ``convert.py``.
"""

from .model import Encodec, EncodecModule, SEANetDecoder, SEANetEncoder
from .quantize import EncodecRVQ

__all__ = ["Encodec", "EncodecModule", "SEANetEncoder", "SEANetDecoder",
           "EncodecRVQ"]
