"""Rsiz profile validation (Cinema / Broadcast / IMF).

Checks a CompressParams + image geometry combination against the
constraints the profile imposes (the reference validates these in its
compress setup [grok: src/bin/jp2/GrkCompress profile handling]; ISO
15444-1 AMD profiles).  Returns a list of violation strings (empty = ok).
"""

from __future__ import annotations

from grok_tpu.core.params import CompressParams, ProgOrder, RsizProfile


def validate_profile(params: CompressParams, width: int, height: int,
                     numcomps: int) -> list[str]:
    errs: list[str] = []
    rsiz = params.rsiz
    if rsiz == RsizProfile.NONE:
        return errs

    if rsiz in (RsizProfile.CINEMA_2K, RsizProfile.CINEMA_4K):
        if not params.irreversible:
            errs.append("cinema profiles require the 9/7 transform")
        if params.tile_w or params.tile_h:
            errs.append("cinema profiles require a single untiled image")
        if (1 << params.cblk_w_exp) > 32 or (1 << params.cblk_h_exp) > 32:
            errs.append("cinema profiles require code-blocks <= 32x32")
        if params.prog_order != ProgOrder.CPRL:
            errs.append("cinema profiles require CPRL progression")
        if numcomps != 3:
            errs.append("cinema profiles require exactly 3 components")
        if rsiz == RsizProfile.CINEMA_2K:
            if width > 2048 or height > 1080:
                errs.append("Cinema2K frame exceeds 2048x1080")
            if params.num_resolutions > 6:
                errs.append("Cinema2K allows at most 5 decomposition levels")
        else:
            if width > 4096 or height > 2160:
                errs.append("Cinema4K frame exceeds 4096x2160")
            if params.num_resolutions > 7:
                errs.append("Cinema4K allows at most 6 decomposition levels")

    elif rsiz == RsizProfile.BROADCAST:
        if params.tile_w or params.tile_h:
            if (params.tile_w, params.tile_h) not in (
                    (width, height),):
                errs.append("broadcast profiles allow 1 tile (or none)")
        if params.prog_order not in (ProgOrder.CPRL,):
            errs.append("broadcast profiles require CPRL progression")
        if (1 << params.cblk_w_exp) > 128 or (1 << params.cblk_h_exp) > 128:
            errs.append("broadcast profiles require code-blocks <= 128x128")

    elif rsiz == RsizProfile.IMF:
        if (1 << params.cblk_w_exp) > 128 or (1 << params.cblk_h_exp) > 128:
            errs.append("IMF requires code-blocks <= 128x128")
        if params.num_layers != 1:
            errs.append("IMF requires exactly one quality layer")
        if params.prog_order != ProgOrder.CPRL:
            errs.append("IMF requires CPRL progression")

    return errs
