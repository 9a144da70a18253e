"""Compression / decompression parameter surfaces.

Field coverage mirrors the reference's two-struct config surface
(grk_cparameters / grk_decompress_parameters; upstream
opj_set_default_encoder_parameters verified in SURVEY.md §1.1), expressed as
dataclasses with standard-conformant defaults (64x64 blocks, 2^15 precincts,
LRCP, 6 resolutions, 1 layer, 2 guard bits).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class ProgOrder(IntEnum):
    LRCP = 0
    RLCP = 1
    RPCL = 2
    PCRL = 3
    CPRL = 4


class MCTMode(IntEnum):
    NONE = 0
    RCT_OR_ICT = 1   # RCT when reversible, ICT when irreversible (Part 1)
    CUSTOM = 2       # custom matrix (Part 2 style, opj_set_MCT analog)
    AUTO_RD = 3      # encode BOTH ways, keep the R-D winner (round 4):
                     # the ICT trades a 2.9x reconstruction-error
                     # amplification (sum of inverse-column norms^2,
                     # 8.73 vs 3) for energy compaction — a LOSS on
                     # content whose channel covariance departs from
                     # the YCbCr model (measured -1.0 dB at 8:1 on the
                     # synthetic RGB bench despite 0.93 channel
                     # correlation).  Costs a second encode pass.


# Code-block style bits (SPcod/SPcoc; ISO 15444-1 Table A.19)
CBLK_BYPASS = 0x01       # selective arithmetic coding bypass (lazy)
CBLK_RESET = 0x02        # reset context probabilities between passes
CBLK_TERMALL = 0x04      # terminate on each coding pass
CBLK_VSC = 0x08          # vertically stripe-causal context
CBLK_PTERM = 0x10        # predictable termination
CBLK_SEGSYM = 0x20       # segmentation symbols
CBLK_HT = 0x40           # HTJ2K (Part 15) block coder (SPcod/SPcoc bit 6)


class RsizProfile(IntEnum):
    NONE = 0x0000
    CINEMA_2K = 0x0003
    CINEMA_4K = 0x0004
    BROADCAST = 0x0100
    IMF = 0x0400
    PART15_HT = 0x4000    # HTJ2K capability (CAP marker present)


@dataclass
class Poc:
    """One progression-order change (POC marker entry)."""

    rs: int; cs: int; layer_end: int; re: int; ce: int; order: ProgOrder


@dataclass
class CompressParams:
    # tiling
    tile_w: int = 0             # 0 -> single tile over the whole image
    tile_h: int = 0
    tile_off_x: int = 0
    tile_off_y: int = 0
    image_off_x: int = 0
    image_off_y: int = 0
    # transform / coding
    num_resolutions: int = 6
    cblk_w_exp: int = 6         # 64
    cblk_h_exp: int = 6
    cblk_style: int = 0
    irreversible: bool = False  # False -> 5/3 + RCT, True -> 9/7 + ICT
    mct: MCTMode | None = None  # None -> auto (on iff >= 3 comps)
    custom_mct: object = None   # (fwd_matrix, inv_matrix, dc offsets)
    prog_order: ProgOrder = ProgOrder.LRCP
    prec_w_exps: list[int] = field(default_factory=list)   # per-resolution PPx
    prec_h_exps: list[int] = field(default_factory=list)
    pocs: list[Poc] = field(default_factory=list)
    # rate control
    num_layers: int = 1
    rates: list[float] = field(default_factory=list)       # compression ratios per layer
    quality: list[float] = field(default_factory=list)     # PSNR targets per layer
    fixed_quality: bool = False
    # quantization
    num_guard_bits: int = 2
    quant_step: float = 0.0     # 0 -> default derived steps
    quant_style_expounded: bool = True
    # ROI (Maxshift, RGN marker): roi_rect in canvas coords; None with
    # roi_shift > 0 upshifts the whole component (upstream-compatible)
    roi_comp: int = -1
    roi_shift: int = 0
    roi_rect: tuple[int, int, int, int] | None = None
    # markers / framing
    sop: bool = False
    eph: bool = False
    write_tlm: bool = False
    write_plt: bool = False
    write_plm: bool = False     # packet lengths in the MAIN header (A.4.6)
    write_ppm: bool = False     # packed packet headers in the main header
    comment: str | None = None
    rsiz: RsizProfile = RsizProfile.NONE
    frame_rate: float | None = None  # profile validation (Cinema/BC/IMF)
    mainlevel: int = 0               # Broadcast/IMF mainlevel
    sublevel: int = 0                # Broadcast sublevel (tiling rules)
    max_tile_parts: int = 1
    # HTJ2K
    ht: bool = False
    ht_planes: int = 0          # HT lossy refinement: code the cleanup
                                # pass at plane p=ht_planes and add HT
                                # SigProp + MagRef passes refining plane
                                # p-1 (3 truncation points per block for
                                # PCRD).  Measured on the 256^2 bench
                                # image: +0.3..+1.2 dB at 4:1..16:1 over
                                # cleanup-only (docs/PERF.md).  p=1 keeps
                                # losslessness; p>=2 drops planes p-2..0.
                                # Host coder path (the fused device
                                # encoder declines; its kernel codes
                                # cleanup-only).
    ht_mixed: bool = False      # HT MIXED sets (round 4): code every
                                # block with BOTH coders and keep the
                                # smaller — HT's raw MagSgn padding is
                                # structural (docs/PERF.md entropy
                                # decomposition), so density-critical
                                # users get <= Part-1 stream size while
                                # HT-favorable blocks stay on the fast
                                # coder.  Per-block choice rides a
                                # binary COM bitmap (j2k.TileHeader
                                # .ht_mixed_bitmap); CAP Ccap15 bit 5
                                # signals mixed.  Host encode path (the
                                # serving encoder/decoder decline mixed
                                # streams; general device decode
                                # dispatches both kernels).
    # container
    jp2: bool = False           # wrap codestream in JP2 boxes
    # execution backend for the block coder: "auto" (native C if built,
    # else scalar), "scalar" (host Python), "native" (C runtime), or
    # "jax" (batched device T1; falls back per-block for special styles)
    backend: str = "auto"
    # jax.sharding.Mesh (1-D, axis "tiles"): shard the forward DWT rows,
    # the T1 encode batch, and the PCRD slope bracket across the mesh;
    # the codestream is byte-identical to the host encoder (5/3 path)
    mesh: object = None

    def validate(self):
        if not (1 <= self.num_resolutions <= 33):
            raise ValueError("num_resolutions must be in [1, 33]")
        if not (2 <= self.cblk_w_exp <= 10) or not (2 <= self.cblk_h_exp <= 10):
            raise ValueError("code-block exponents must be in [2, 10]")
        if self.cblk_w_exp + self.cblk_h_exp > 12:
            raise ValueError("code-block area must be <= 4096")
        if self.num_layers < 1:
            raise ValueError("need at least one layer")
        if self.rates and len(self.rates) != self.num_layers:
            raise ValueError("len(rates) must equal num_layers")
        if self.quality and len(self.quality) != self.num_layers:
            raise ValueError("len(quality) must equal num_layers")
        if self.prec_w_exps and len(self.prec_w_exps) < self.num_resolutions:
            raise ValueError("need a precinct exponent per resolution")
        if not (0 <= self.num_guard_bits <= 7):
            raise ValueError("guard bits must be in [0, 7]")
        if (self.ht or self.ht_mixed) and self.cblk_style & ~CBLK_HT:
            raise ValueError(
                "HTJ2K is a distinct block coder: Part-1 mode switches "
                "(BYPASS/RESET/TERMALL/VSC/PTERM/SEGSYM) do not apply")
        if self.ht_mixed and self.ht_planes:
            raise ValueError(
                "ht_mixed compares single-segment streams; the "
                "ht_planes refinement extension is HT-only")


@dataclass
class DecompressParams:
    reduce: int = 0                 # resolution reduction (discard levels)
    max_layers: int = 0             # 0 -> all layers
    tile_index: int | None = None   # decode a single tile
    window: tuple[int, int, int, int] | None = None   # canvas-coord region
    components: list[int] | None = None               # component subset
    strict: bool | None = None      # strict vs permissive (truncated)
                                    # decode.  None = per-surface default:
                                    # decompress() resolves to True,
                                    # decompress_device[_batch]() to False
                                    # (the serving fast path validates
                                    # framing, not per-pass payloads) — so
                                    # constructing params just to set e.g.
                                    # reduce= never changes validation
                                    # semantics or drops the fast path.
    force_rgb: bool = False
    upsample: bool = False
    apply_icc: bool = False
    backend: str = "auto"           # "auto" (native C if built, else
                                    # scalar), "scalar", "native", or "jax"
                                    # (batched device T1 + device DWT;
                                    # falls back per-block for non-default
                                    # coding styles)
    keep_device: bool = False       # jax backend: leave decoded pixels on
                                    # the device (api.decompress_device) —
                                    # no HBM->host download
    mesh: object = None             # jax.sharding.Mesh (1-D, axis "tiles"):
                                    # decode with the T1 block batch and the
                                    # inverse DWT levels sharded across the
                                    # mesh (giant-tile path, SURVEY §2.1)
