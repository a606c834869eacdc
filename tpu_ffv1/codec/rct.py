"""Version-4 per-slice RCT parameter search (choose_rct_params).

Behavioral parity reference: ffv1enc.c:1064-1144 — evaluates 15 candidate
luma coefficient pairs on second-order differences of the slice and picks
the minimum-cost pair (first index wins ties).  Vectorized numpy, exact
integer arithmetic (arithmetic >> on negatives).

Note: the reference calls this for *every* colorspace when version > 3,
interpreting YUV planes as packed RGB rows — i.e. it reads out-of-slice
bytes whose values depend on the caller's frame stride/padding.  That is
not a reproducible function of the pixel content, so this framework
applies the search only where it is meaningful (colorspace 1) and uses
the (1, 1) defaults otherwise; v4 YUV streams remain valid and
reference-decodable, just not bit-identical to the reference's encoder.
"""
from __future__ import annotations

import numpy as np

RCT_Y_COEFF = [
    (0, 0), (1, 1), (2, 2), (0, 2), (2, 0), (4, 0), (0, 4),
    (0, 3), (3, 0), (3, 1), (1, 3), (1, 2), (2, 1), (0, 1), (1, 0),
]


def choose_rct_params(planes, lbd: bool):
    """Returns (slice_rct_by_coef, slice_rct_ry_coef).

    ``planes``: (h, w, 4) uint8 for lbd packed BGRA, else [p0, p1, p2]
    uint16 in FFmpeg GBR plane order (same convention as the slice
    codec; ffv1enc.c reads plane0 into its "b" variable).
    """
    if lbd:
        b = planes[..., 0].astype(np.int64)
        g = planes[..., 1].astype(np.int64)
        r = planes[..., 2].astype(np.int64)
    else:
        b = np.asarray(planes[0], np.int64)
        g = np.asarray(planes[1], np.int64)
        r = np.asarray(planes[2], np.int64)

    # horizontal first differences (lastX starts at 0 each row)
    def hdiff(p):
        d = np.empty_like(p)
        d[:, 0] = p[:, 0]
        d[:, 1:] = p[:, 1:] - p[:, :-1]
        return d

    ab, ag, ar = hdiff(b), hdiff(g), hdiff(r)

    # second-order: current row's hdiff minus previous row's, x>=1 y>=1.
    # The previous row is read back from the reference's int16_t scratch
    # buffer (ffv1enc.c:1087 `int16_t *sample[3]`), so >8-bit first
    # differences wrap to int16 before the subtraction.
    def w16(v):
        return ((v + 0x8000) & 0xFFFF) - 0x8000

    bg = ag[1:, 1:] - w16(ag[:-1, 1:])
    bb = ab[1:, 1:] - w16(ab[:-1, 1:])
    br = ar[1:, 1:] - w16(ar[:-1, 1:])
    br = br - bg
    bb = bb - bg

    best = 0
    best_stat = None
    for i, (ry, by) in enumerate(RCT_Y_COEFF):
        stat = int(np.abs(bg + ((br * ry + bb * by) >> 2)).sum())
        if best_stat is None or stat < best_stat:
            best_stat = stat
            best = i
    ry, by = RCT_Y_COEFF[best]
    return by, ry
