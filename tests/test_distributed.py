"""Multi-host scaffolding, degenerate single-process mode (SURVEY §7
phase 6): the same entry points activate jax.distributed and
process_allgather on a real pod slice."""

import numpy as np

from grok_tpu.api import compress
from grok_tpu.core.params import CompressParams
from grok_tpu.parallel.distributed import (compress_distributed,
                                           gather_bytes_to_host0,
                                           init_distributed)
from grok_tpu.util.oracle import synthetic_image


def test_init_degenerate():
    assert init_distributed() == (0, 1)


def test_gather_single_process_identity():
    assert gather_bytes_to_host0(b"\xff\x00abc") == [b"\xff\x00abc"]
    assert gather_bytes_to_host0(b"") == [b""]


def test_compress_distributed_matches_compress():
    img = synthetic_image(200, 168, 1, seed=11)
    cp = CompressParams(tile_w=64, tile_h=64, num_resolutions=3,
                        write_tlm=True)
    assert compress_distributed(img, cp) == compress(img, cp)


def test_compress_distributed_rejects_container_modes():
    import pytest
    with pytest.raises(ValueError):
        compress_distributed(np.zeros((16, 16), np.uint8),
                             CompressParams(jp2=True))
