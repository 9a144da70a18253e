"""grok_tpu: TPU-native JPEG 2000 codec (JAX / XLA / Pallas).

Capability parity target: the Grok (ao2/grok) C++ codec — see SURVEY.md.
"""

from grok_tpu.api import (HeaderInfo, compress, compress_device,  # noqa: F401
                          compress_device_batch, decompress,
                          decompress_device, decompress_device_batch,
                          read_header)
from grok_tpu.codec import Compressor, Decompressor  # noqa: F401
from grok_tpu.util.msg import set_msg_handlers  # noqa: F401
from grok_tpu.core.image import ColorSpace, Component, Image  # noqa: F401
from grok_tpu.core.params import (CompressParams, DecompressParams,  # noqa: F401
                                  MCTMode, ProgOrder)

__version__ = "0.1.0"


def initialize(num_threads: int | None = None) -> bool:
    """grk_initialize analog: warm the native runtime and set its thread
    count (overrides the GROK_NUM_THREADS env; 0/None = online CPUs).

    Returns True when the native C runtime is available."""
    import os

    from grok_tpu import native
    if num_threads:
        os.environ["GROK_NUM_THREADS"] = str(int(num_threads))
    elif "GROK_NUM_THREADS" in os.environ and num_threads == 0:
        del os.environ["GROK_NUM_THREADS"]
    return native.available()


def deinitialize() -> None:
    """grk_deinitialize analog (the Python runtime holds no global
    state beyond the lazily-loaded native library; provided for API
    parity)."""

