"""Train the CxtVLC code-length tables for the HT cleanup coder.

Runs the full pipeline encoder over a deterministic synthetic corpus
(mixed content: gradients, texture, noise; gray + RGB; 32x32 and 64x64
code-blocks; several DWT depths), collecting every coded (context,
symbol) pair via t1ht.scalar._TRACE_SYMS, then prints the
`_TRAINED_LENS` literal to paste into grok_tpu/t1ht/tables.py.

Lengths are Huffman-optimal for the corpus, clamped to <= 7 bits
(Kraft-repaired); symbols never seen in the corpus get length 7 at
table build time (tables._build fills gaps).

Usage: PYTHONPATH=. python tools/gen_ht_tables.py
"""

from __future__ import annotations

import sys
from collections import Counter

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import grok_tpu.t1ht.scalar as sc  # noqa: E402
from grok_tpu import CompressParams, compress  # noqa: E402
from grok_tpu.t1ht.tables import _huffman_lengths, _symbols  # noqa: E402
from grok_tpu.util.oracle import synthetic_image  # noqa: E402


def corpus():
    for seed in (7, 11, 23):
        yield synthetic_image(512, 512, 1, seed=seed)
    yield synthetic_image(512, 384, 3, seed=5)
    yield synthetic_image(256, 256, 1, seed=9)
    # smooth content: pure gradients + soft bumps (low-activity contexts)
    yy, xx = np.mgrid[0:384, 0:384]
    smooth = (128 + 60 * np.sin(xx / 37.0) * np.cos(yy / 53.0)
              + 0.1 * xx + 0.12 * yy).astype(np.uint8)
    yield smooth
    # near-binary structure
    rng = np.random.default_rng(3)
    yield (rng.random((256, 256)) < 0.5).astype(np.uint8) * 200


def main():
    counts: Counter = Counter()
    sc._TRACE_SYMS = trace = []
    for img in corpus():
        for cbexp in (5, 6):
            for nres in (3, 5):
                compress(img, CompressParams(ht=True, num_resolutions=nres,
                                             cblk_w_exp=cbexp,
                                             cblk_h_exp=cbexp))
    counts.update(trace)
    sc._TRACE_SYMS = None

    out = {}
    for c in range(8):
        raw = {s: float(n) for (cc, s), n in counts.items() if cc == c}
        if not raw:
            continue
        total_c = sum(raw.values())
        # keep the base (eps_k = 0) alphabet plus EMB symbols frequent
        # enough to earn a short code; fold rare EMB mass into the base
        # symbol (the encoder falls back to it)
        w: dict[int, float] = {}
        for s, n in raw.items():
            base = s & 0x1F
            if s >> 5 and n < max(16.0, 2e-4 * total_c):
                w[base] = w.get(base, 0.0) + n
            else:
                w[s] = w.get(s, 0.0) + n
        for s in _symbols(c):
            w.setdefault(s, 0.25)
        # cap the alphabet so 7-bit codes stay feasible (Kraft)
        if len(w) > 120:
            keep = sorted(w, key=lambda s: (-(w[s]), s))
            for s in keep[120:]:
                if s >> 5:
                    w[s & 0x1F] = w.get(s & 0x1F, 0.25) + w.pop(s)
        out[c] = _huffman_lengths(w)

    print("_TRAINED_LENS = {")
    for c in sorted(out):
        items = ", ".join(f"{s}: {ln}"
                          for s, ln in sorted(out[c].items()))
        print(f"    {c}: {{{items}}},")
    print("}")
    total = sum(counts.values())
    bits = sum(out[c][s] * n for (c, s), n in counts.items())
    print(f"# corpus: {total} quads, {bits / total:.3f} bits/quad",
          file=sys.stderr)


if __name__ == "__main__":
    main()
