"""ISO/IEC 15444-4 conformance corpus hook (SURVEY §4 item 1).

The ISO test images (p0_*.j2k / p1_*.j2k with their reference .pgx
decodes) are not redistributable and this environment has no network,
so the corpus directory ships empty; drop the files into
tests/conformance/ (or point GROK_CONFORMANCE_DIR at them) and these
tests activate:

    tests/conformance/
        p0_01.j2k            codestreams (class 0 and 1)
        p0_01_ref/*.pgx      per-component reference decodes
        ...

Until then the OpenJPEG 2.5.0 bidirectional interop matrix
(tests/test_roundtrip.py, test_interop_matrix.py) is the conformance
gate.  Class-1 allows the Annex-A error tolerances; we apply the
strict class-0 rule (exact for reversible, +-1 peak error otherwise)
which is sufficient for the profile-0 images.
"""

import glob
import os

import numpy as np
import pytest

_DIR = os.environ.get(
    "GROK_CONFORMANCE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "conformance"))

_STREAMS = sorted(glob.glob(os.path.join(_DIR, "p[01]_*.j2k")) +
                  glob.glob(os.path.join(_DIR, "p[01]_*.jp2")))


def _refs_for(stream: str) -> list[str]:
    base = os.path.splitext(stream)[0]
    return sorted(glob.glob(os.path.join(base + "_ref", "*.pgx")))


@pytest.mark.skipif(not _STREAMS,
                    reason="conformance corpus not present (see module "
                           "docstring for the drop-in layout)")
@pytest.mark.parametrize("stream", _STREAMS,
                         ids=[os.path.basename(s) for s in _STREAMS])
def test_conformance_decode(stream):
    from grok_tpu.api import decompress
    from grok_tpu.core.params import DecompressParams
    from grok_tpu.util.imageio import read_pgx

    img = decompress(open(stream, "rb").read(),
                     DecompressParams(strict=False))
    refs = _refs_for(stream)
    if not refs:
        pytest.skip(f"no reference .pgx next to {stream}")
    assert len(refs) == len(img.components)
    for comp, ref_path in zip(img.components, refs):
        ref = np.asarray(read_pgx(ref_path).components[0].data,
                         dtype=np.int64)
        got = np.asarray(comp.data, dtype=np.int64)
        assert got.shape == ref.shape
        err = np.abs(got - ref).max()
        assert err <= 1, f"{os.path.basename(ref_path)}: peak error {err}"
