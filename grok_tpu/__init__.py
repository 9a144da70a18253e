"""grok_tpu: TPU-native JPEG 2000 codec (JAX / XLA / Pallas).

Capability parity target: the Grok (ao2/grok) C++ codec — see SURVEY.md.
"""

from grok_tpu.api import (HeaderInfo, compress, decompress,  # noqa: F401
                          read_header)
from grok_tpu.codec import Decompressor  # noqa: F401
from grok_tpu.util.msg import set_msg_handlers  # noqa: F401
from grok_tpu.core.image import ColorSpace, Component, Image  # noqa: F401
from grok_tpu.core.params import (CompressParams, DecompressParams,  # noqa: F401
                                  MCTMode, ProgOrder)

__version__ = "0.1.0"
