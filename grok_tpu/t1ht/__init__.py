"""HTJ2K (ISO/IEC 15444-15) block coder — experimental self-consistent path.

Structure per the spec: the HT Cleanup pass codes quad significance
patterns through a context-adaptive VLC, initial-context significance
through the MEL adaptive run-length coder, and magnitudes/signs through
the MagSgn raw stream; optional HT SigProp / HT MagRef passes refine one
further bitplane.  The normative CxtVLC code tables could not be obtained
in this offline environment, so this implementation uses self-built
canonical prefix codes with the same structural interface (see
t1ht/tables.py) — our encoder and decoder are bit-exact with each other
but NOT interoperable with conformant HTJ2K codecs until the normative
tables are dropped in.

Reference parity: [grok: src/lib/core/t1/t1_ht/] (SURVEY.md §2 row 8).
"""

from grok_tpu.t1ht.scalar import ht_decode_block, ht_encode_block

__all__ = ["ht_encode_block", "ht_decode_block"]
