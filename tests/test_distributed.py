"""Multi-host scaffolding (SURVEY §7 phase 6): the degenerate
single-process mode in-process, plus a REAL 2-process jax.distributed
run (CPU Gloo backend, subprocess workers) exercising the
non-degenerate init / varlen gather / process-sharded encode paths."""

import os
import subprocess
import sys
import textwrap

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


_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]; outp = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from grok_tpu.parallel.distributed import (compress_distributed,
                                               gather_bytes_to_host0,
                                               init_distributed)
    got = init_distributed(coordinator=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert got == (pid, 2), got
    # varlen gather: different blob sizes per process
    blobs = gather_bytes_to_host0(bytes([pid]) * (10 + 90 * pid))
    assert blobs == [b"\\x00" * 10, b"\\x01" * 100], [len(b) for b in blobs]
    from grok_tpu.core.params import CompressParams
    from grok_tpu.util.oracle import synthetic_image
    img = synthetic_image(200, 168, 1, seed=11)
    cp = CompressParams(tile_w=64, tile_h=64, num_resolutions=3,
                        write_tlm=True)
    data = compress_distributed(img, cp)
    if pid == 0:
        open(outp, "wb").write(data)
    else:
        assert data is None
    # process-sharded DECODE of the same stream: both processes decode
    # their tiles, host 0 assembles; non-host-0 gets None
    data = gather_bytes_to_host0(data if pid == 0 else b"")[0]
    from grok_tpu.parallel.distributed import decompress_distributed
    out = decompress_distributed(data)
    import numpy as np
    if pid == 0:
        np.save(outp + ".npy", out.to_array())
    else:
        assert out is None
    # round 5: process-sharded decode THROUGH THE SERVING PIPELINE
    # (VERDICT #7) — each process's tiles go through
    # try_decode_serving (interpret kernels), bit-exact vs host
    os.environ["GROK_PALLAS_INTERPRET"] = "1"
    os.environ["GROK_HT_PALLAS"] = "1"
    from grok_tpu.api import compress as _compress
    from grok_tpu.core.params import DecompressParams
    from grok_tpu.pipeline import serve as _serve
    from grok_tpu.util.oracle import synthetic_image as _syn
    img2 = _syn(32, 24, 1, seed=9)
    s2 = _compress(img2, CompressParams(ht=True, num_resolutions=2,
                                        tile_w=16, tile_h=16,
                                        cblk_w_exp=3, cblk_h_exp=3))
    taken = []
    _orig = _serve.try_decode_serving
    def _probe(*a, **kw):
        r = _orig(*a, **kw)
        taken.append(r is not None)
        return r
    _serve.try_decode_serving = _probe
    out2 = decompress_distributed(s2, DecompressParams(backend="jax"))
    _serve.try_decode_serving = _orig
    assert taken and all(taken), ("serving declined", taken)
    if pid == 0:
        np.save(outp + ".serve.npy", out2.to_array())
    else:
        assert out2 is None
""")


def test_two_process_jax_distributed(tmp_path):
    """First-class multi-process execution: 2 CPU processes via
    jax.distributed (Gloo collectives) run the NON-degenerate branches
    of init_distributed, gather_bytes_to_host0, and
    compress_distributed; the assembled stream is byte-identical to the
    single-process encoder."""
    outp = tmp_path / "dist.j2k"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    env.pop("GROK_COORDINATOR", None)
    # ephemeral coordinator port: a hardcoded one collides with
    # concurrent runs / busy ports and hangs to the 480 s timeout
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), str(port), str(outp)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), outs
    img = synthetic_image(200, 168, 1, seed=11)
    cp = CompressParams(tile_w=64, tile_h=64, num_resolutions=3,
                        write_tlm=True)
    data = compress(img, cp)
    assert outp.read_bytes() == data, outs
    # 2-process sharded decode matches the single-process decoder
    from grok_tpu import decompress
    got = np.load(str(outp) + ".npy")
    assert np.array_equal(got, decompress(data).to_array()), outs
    # the serving-path sharded decode too (round 5)
    img2 = synthetic_image(32, 24, 1, seed=9)
    s2 = compress(img2, CompressParams(ht=True, num_resolutions=2,
                                       tile_w=16, tile_h=16,
                                       cblk_w_exp=3, cblk_h_exp=3))
    got2 = np.load(str(outp) + ".serve.npy")
    assert np.array_equal(got2, decompress(s2).to_array()), outs


def test_decompress_distributed_single_process_matches():
    from grok_tpu import decompress
    from grok_tpu.core.params import DecompressParams
    from grok_tpu.parallel.distributed import decompress_distributed
    img = synthetic_image(160, 128, 3, seed=2)
    cp = CompressParams(num_resolutions=3, tile_w=64, tile_h=64)
    cs = compress(img, cp)
    assert np.array_equal(decompress_distributed(cs).to_array(),
                          decompress(cs).to_array())
    dpr = DecompressParams(reduce=1)
    assert np.array_equal(decompress_distributed(cs, dpr).to_array(),
                          decompress(cs, dpr).to_array())


def test_decompress_distributed_rejects_subset_modes():
    import pytest
    from grok_tpu.core.params import DecompressParams
    from grok_tpu.parallel.distributed import decompress_distributed
    cs = compress(synthetic_image(64, 64, 1, seed=1),
                  CompressParams(num_resolutions=2))
    with pytest.raises(ValueError):
        decompress_distributed(cs, DecompressParams(tile_index=0))
    with pytest.raises(ValueError):
        decompress_distributed(cs, DecompressParams(components=[0]))


def test_decompress_distributed_window_matches():
    """Round 5: window decode accepted (tile intersection + the
    api.decompress crop, bit-exact vs the single-stream decoder)."""
    from grok_tpu import decompress
    from grok_tpu.core.params import DecompressParams
    from grok_tpu.parallel.distributed import decompress_distributed
    img = synthetic_image(160, 128, 1, seed=5)
    cs = compress(img, CompressParams(num_resolutions=3, tile_w=64,
                                      tile_h=64))
    for win in ((10, 20, 100, 90), (64, 0, 160, 64)):
        dpw = DecompressParams(window=win)
        assert np.array_equal(
            decompress_distributed(cs, dpw).to_array(),
            decompress(cs, dpw).to_array()), win


def test_decompress_distributed_serving_path(monkeypatch):
    """Round 5 (VERDICT #7): with backend="jax" each process's tile
    shard goes through the cached SERVING pipeline (the device kernel
    path), bit-exact vs the host decoder.  HT stream, tiny blocks,
    interpret-mode kernels on CPU."""
    from grok_tpu import decompress, native
    if not native.available():
        import pytest
        pytest.skip("native runtime unavailable")
    from grok_tpu.core.params import DecompressParams
    from grok_tpu.parallel.distributed import decompress_distributed
    from grok_tpu.pipeline import serve

    monkeypatch.setenv("GROK_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("GROK_HT_PALLAS", "1")
    img = synthetic_image(32, 24, 1, seed=9)
    cs = compress(img, CompressParams(ht=True, num_resolutions=2,
                                      tile_w=16, tile_h=16,
                                      cblk_w_exp=3, cblk_h_exp=3))
    taken = []
    orig = serve.try_decode_serving

    def probe(*a, **kw):
        r = orig(*a, **kw)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(
        "grok_tpu.pipeline.serve.try_decode_serving", probe)
    serve._PLANS.clear()
    out = decompress_distributed(cs, DecompressParams(backend="jax"))
    assert taken and all(taken), f"serving declined: {taken}"
    assert np.array_equal(out.to_array(), decompress(cs).to_array())
