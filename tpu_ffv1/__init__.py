"""tpu_ffv1 — a TPU-native FFV1 video codec framework.

Bit-exact FFV1 (versions 0-4, range & Golomb-Rice coders, GOP/P-frame
context carry-over) with three interchangeable execution paths:

  * spec:   pure-Python scalar oracle (tpu_ffv1.codec)
  * native: C host runtime for production host encode/decode (native/)
  * tpu:    JAX/XLA/Pallas device pipeline (tpu_ffv1.tpu)
"""

from .codec.params import EncoderParams
from .codec.encoder import FFV1Encoder
from .codec.decoder import FFV1Decoder

__all__ = ["EncoderParams", "FFV1Encoder", "FFV1Decoder"]
__version__ = "0.1.0"
