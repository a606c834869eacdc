"""Slice grid geometry and per-slice adaptive state.

Behavioral parity references: libavcodec/ffv1.c:67-160 (slice state and
grid), ffv1.c:177-202 (state clearing).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core import tables as T
from ..core.golomb import new_vlc_states


@dataclass
class SliceGeometry:
    sx: int          # slice column index
    sy: int          # slice row index
    x: int           # left, luma pixels
    y: int           # top, luma pixels
    width: int
    height: int


def slice_grid(width: int, height: int, num_h: int, num_v: int):
    """Slice bounds (ffv1.c:117-145): edges at width*i/num_h (floor)."""
    out = []
    for i in range(num_h * num_v):
        sx = i % num_h
        sy = i // num_h
        sxs = width * sx // num_h
        sxe = width * (sx + 1) // num_h
        sys = height * sy // num_v
        sye = height * (sy + 1) // num_v
        out.append(SliceGeometry(sx, sy, sxs, sys, sxe - sxs, sye - sys))
    return out


@dataclass
class PlaneState:
    """Per-(slice, coded-plane) adaptive state."""
    quant_table_index: int
    context_count: int
    # range-coder contexts: (context_count, 32) uint8
    states: np.ndarray | None = None
    # golomb-rice contexts: structured VLC_STATE_DTYPE array
    vlc_states: np.ndarray | None = None
    quant_table: np.ndarray | None = None  # (5, 256) int16


@dataclass
class SliceState:
    geom: SliceGeometry
    planes: list = field(default_factory=list)
    slice_coding_mode: int = 0
    slice_rct_by_coef: int = 1
    slice_rct_ry_coef: int = 1
    slice_reset_contexts: int = 0
    slice_damaged: bool = False
    run_index: int = 0


def alloc_slice_state(rp, geom: SliceGeometry) -> SliceState:
    """Allocate per-slice plane states (ff_ffv1_init_slice_state)."""
    ss = SliceState(geom=geom)
    for _ in range(rp.plane_count):
        qidx = rp.context_model
        cc = rp.context_counts[qidx]
        ps = PlaneState(quant_table_index=qidx, context_count=cc,
                        quant_table=np.array(rp.quant_tables[qidx]))
        if rp.ac != T.AC_GOLOMB_RICE:
            ps.states = np.full((cc, T.CONTEXT_SIZE), 128, dtype=np.uint8)
        else:
            ps.vlc_states = new_vlc_states(cc)
        ss.planes.append(ps)
    return ss


def clear_slice_state(rp, ss: SliceState):
    """Reset adaptive contexts (ffv1.c:177-202)."""
    for ps in ss.planes:
        if ps.states is not None:
            init = rp.initial_states[ps.quant_table_index] if rp.initial_states else None
            if init is not None:
                ps.states[:] = init[:ps.context_count]
            else:
                ps.states[:] = 128
        if ps.vlc_states is not None:
            ps.vlc_states[:] = new_vlc_states(ps.context_count)
