"""FFV1 header bitstream: global extradata (v>=2), in-band v0/v1/v2 frame
headers, slice headers, and the quant-table RLE wire format.

Behavioral parity references:
  write_quant_table(s):  libavcodec/ffv1enc.c:475-496
  write_header:          ffv1enc.c:498-543
  write_extradata:       ffv1enc.c:545-619
  encode_slice_header:   ffv1enc.c:1031-1062
  read_quant_table(s):   libavcodec/ffv1dec.c:476-519
  read_extra_header:     ffv1dec.c:521-636
  read_header:           ffv1dec.c:638-874
  decode_slice_header:   ffv1dec.c:282-359
"""
from __future__ import annotations

import numpy as np

from ..core import tables as T
from ..core.crc import crc32_ieee
from ..core.rac import RangeDecoder, RangeEncoder, default_state_tables
from .symbols import get_symbol, put_symbol


def _fresh_states():
    return np.full(T.CONTEXT_SIZE, 128, dtype=np.uint8)


def write_quant_table(c: RangeEncoder, quant_table: np.ndarray):
    """RLE of change positions over indices 1..127 (ffv1enc.c:475-488)."""
    states = _fresh_states()
    last = 0
    for i in range(1, 128):
        if quant_table[i] != quant_table[i - 1]:
            put_symbol(c, states, i - last - 1, False)
            last = i
    put_symbol(c, states, 128 - last - 1, False)


def write_quant_tables(c: RangeEncoder, quant_tables: np.ndarray):
    for i in range(5):
        write_quant_table(c, quant_tables[i])


def read_quant_table(c: RangeDecoder, scale: int):
    """ffv1dec.c:476-501; returns (table int16[256], 2*levels-1)."""
    qt = np.zeros(256, dtype=np.int16)
    states = _fresh_states()
    i = 0
    v = 0
    while i < 128:
        length = get_symbol(c, states, False) + 1
        if length > 128 - i:
            raise ValueError("invalid quant table RLE")
        for _ in range(length):
            qt[i] = scale * v
            i += 1
        v += 1
    for i in range(1, 128):
        qt[256 - i] = -qt[i]
    qt[128] = -qt[127]
    return qt, 2 * v - 1


def read_quant_tables(c: RangeDecoder):
    """ffv1dec.c:503-519; returns (tables (5,256), context_count)."""
    tables = np.zeros((5, 256), dtype=np.int16)
    context_count = 1
    for i in range(5):
        tables[i], levels = read_quant_table(c, context_count)
        context_count *= levels
        if context_count > 32768:
            raise ValueError("context count overflow")
    return tables, (context_count + 1) // 2


def write_extradata(rp) -> bytes:
    """Global header for version >= 2 (ffv1enc.c:545-619), CRC-protected."""
    c = RangeEncoder(*default_state_tables())
    states = _fresh_states()
    states2 = np.full((32, T.CONTEXT_SIZE), 128, dtype=np.uint8)

    put_symbol(c, states, rp.version, False)
    if rp.version > 2:
        put_symbol(c, states, rp.micro_version, False)
    put_symbol(c, states, rp.ac, False)
    if rp.ac == T.AC_RANGE_CUSTOM_TAB:
        one, _ = default_state_tables()
        for i in range(1, 256):
            put_symbol(c, states,
                       int(rp.state_transition[i]) - int(one[i]), True)

    put_symbol(c, states, rp.colorspace, False)
    put_symbol(c, states, rp.bits_per_raw_sample, False)
    c.put_rac(states, 0, 1 if rp.chroma_planes else 0)
    put_symbol(c, states, rp.chroma_h_shift, False)
    put_symbol(c, states, rp.chroma_v_shift, False)
    c.put_rac(states, 0, 1 if rp.transparency else 0)
    put_symbol(c, states, rp.num_h_slices - 1, False)
    put_symbol(c, states, rp.num_v_slices - 1, False)

    put_symbol(c, states, rp.quant_table_count, False)
    for i in range(rp.quant_table_count):
        write_quant_tables(c, rp.quant_tables[i])

    for i in range(rp.quant_table_count):
        init = rp.initial_states[i] if rp.initial_states else None
        nontrivial = init is not None and bool(np.any(init != 128))
        if nontrivial:
            c.put_rac(states, 0, 1)
            cc = rp.context_counts[i]
            for j in range(cc):
                for k in range(T.CONTEXT_SIZE):
                    pred = int(init[j - 1][k]) if j else 128
                    # (int8_t) cast of the delta (ffv1enc.c:601)
                    delta = ((int(init[j][k]) - pred + 128) & 0xFF) - 128
                    put_symbol(c, states2[k], delta, True)
        else:
            c.put_rac(states, 0, 0)

    if rp.version > 2:
        put_symbol(c, states, rp.ec, False)
        put_symbol(c, states, rp.intra, False)

    data = c.terminate()
    crc = crc32_ieee(data)
    return data + int(crc).to_bytes(4, "little")


class GlobalHeader:
    """Decoded global extradata fields."""

    def __init__(self):
        self.version = 0
        self.micro_version = 0
        self.ac = 0
        self.state_transition = None
        self.colorspace = 0
        self.bits_per_raw_sample = 8
        self.chroma_planes = False
        self.chroma_h_shift = 0
        self.chroma_v_shift = 0
        self.transparency = False
        self.plane_count = 2
        self.num_h_slices = 1
        self.num_v_slices = 1
        self.quant_table_count = 0
        self.quant_tables = None
        self.context_counts = ()
        self.initial_states = []
        self.ec = 0
        self.intra = 0


def read_extra_header(extradata: bytes) -> GlobalHeader:
    """ffv1dec.c:521-636."""
    g = GlobalHeader()
    c = RangeDecoder(extradata, *default_state_tables())
    states = _fresh_states()
    states2 = np.full((32, T.CONTEXT_SIZE), 128, dtype=np.uint8)

    g.version = get_symbol(c, states, False)
    if g.version < 2:
        raise ValueError("invalid version in global header")
    if g.version > 2:
        g.micro_version = get_symbol(c, states, False)
        if g.micro_version < 0:
            raise ValueError("invalid micro_version")
    g.ac = get_symbol(c, states, False)
    if g.ac == T.AC_RANGE_CUSTOM_TAB:
        one, _ = default_state_tables()
        st = np.zeros(256, dtype=np.uint8)
        for i in range(1, 256):
            st[i] = (get_symbol(c, states, True) + int(one[i])) & 0xFF
        g.state_transition = st

    g.colorspace = get_symbol(c, states, False)
    g.bits_per_raw_sample = get_symbol(c, states, False)
    g.chroma_planes = bool(c.get_rac(states, 0))
    g.chroma_h_shift = get_symbol(c, states, False)
    g.chroma_v_shift = get_symbol(c, states, False)
    g.transparency = bool(c.get_rac(states, 0))
    g.plane_count = 1 + (1 if (g.chroma_planes or g.version < 4) else 0) + \
        (1 if g.transparency else 0)
    g.num_h_slices = 1 + get_symbol(c, states, False)
    g.num_v_slices = 1 + get_symbol(c, states, False)

    if g.chroma_h_shift > 4 or g.chroma_v_shift > 4:
        raise ValueError("invalid chroma shift")

    g.quant_table_count = get_symbol(c, states, False)
    if not (0 < g.quant_table_count <= T.MAX_QUANT_TABLES):
        raise ValueError("invalid quant table count")

    g.quant_tables = np.zeros((g.quant_table_count, 5, 256), dtype=np.int16)
    ccs = []
    for i in range(g.quant_table_count):
        g.quant_tables[i], cc = read_quant_tables(c)
        ccs.append(cc)
    g.context_counts = tuple(ccs)

    g.initial_states = [None] * g.quant_table_count
    for i in range(g.quant_table_count):
        if c.get_rac(states, 0):
            cc = g.context_counts[i]
            init = np.full((cc, T.CONTEXT_SIZE), 128, dtype=np.uint8)
            for j in range(cc):
                for k in range(T.CONTEXT_SIZE):
                    pred = int(init[j - 1][k]) if j else 128
                    init[j][k] = (pred + get_symbol(c, states2[k], True)) & 0xFF
            g.initial_states[i] = init

    if g.version > 2:
        g.ec = get_symbol(c, states, False)
        if g.micro_version > 2:
            g.intra = get_symbol(c, states, False)

    if g.version > 2:
        if len(extradata) < 4 or crc32_ieee(extradata) != 0:
            raise ValueError("global header CRC mismatch")

    return g


def write_frame_header_v01(rp, c: RangeEncoder):
    """In-band header on keyframes for version < 2 (ffv1enc.c:506-522)."""
    states = _fresh_states()
    put_symbol(c, states, rp.version, False)
    put_symbol(c, states, rp.ac, False)
    if rp.ac == T.AC_RANGE_CUSTOM_TAB:
        for i in range(1, 256):
            put_symbol(c, states,
                       int(rp.state_transition[i]) - int(c.one_state[i]), True)
    put_symbol(c, states, rp.colorspace, False)
    if rp.version > 0:
        put_symbol(c, states, rp.bits_per_raw_sample, False)
    c.put_rac(states, 0, 1 if rp.chroma_planes else 0)
    put_symbol(c, states, rp.chroma_h_shift, False)
    put_symbol(c, states, rp.chroma_v_shift, False)
    c.put_rac(states, 0, 1 if rp.transparency else 0)
    write_quant_tables(c, rp.quant_tables[rp.context_model])


def write_frame_header_v2(rp, slices, c: RangeEncoder):
    """In-band slice list for version 2 (ffv1enc.c:523-542)."""
    states = _fresh_states()
    put_symbol(c, states, rp.slice_count, False)
    for ss in slices:
        g = ss.geom
        put_symbol(c, states,
                   (g.x + 1) * rp.num_h_slices // rp.width, False)
        put_symbol(c, states,
                   (g.y + 1) * rp.num_v_slices // rp.height, False)
        put_symbol(c, states,
                   (g.width + 1) * rp.num_h_slices // rp.width - 1, False)
        put_symbol(c, states,
                   (g.height + 1) * rp.num_v_slices // rp.height - 1, False)
        for _ in range(rp.plane_count):
            put_symbol(c, states, rp.context_model, False)


def write_slice_header(rp, ss, c: RangeEncoder, interlaced=False,
                       top_field_first=False):
    """Version >= 3 slice header (ffv1enc.c:1031-1062)."""
    states = _fresh_states()
    g = ss.geom
    put_symbol(c, states, (g.x + 1) * rp.num_h_slices // rp.width, False)
    put_symbol(c, states, (g.y + 1) * rp.num_v_slices // rp.height, False)
    put_symbol(c, states,
               (g.width + 1) * rp.num_h_slices // rp.width - 1, False)
    put_symbol(c, states,
               (g.height + 1) * rp.num_v_slices // rp.height - 1, False)
    for _ in range(rp.plane_count):
        put_symbol(c, states, rp.context_model, False)
    if not interlaced:
        put_symbol(c, states, 3, False)
    else:
        put_symbol(c, states, 1 + (0 if top_field_first else 1), False)
    put_symbol(c, states, rp.sar[0], False)
    put_symbol(c, states, rp.sar[1], False)
    if rp.version > 3:
        c.put_rac(states, 0, 1 if ss.slice_coding_mode == 1 else 0)
        put_symbol(c, states, ss.slice_coding_mode, False)
        if ss.slice_coding_mode != 1:
            put_symbol(c, states, ss.slice_rct_by_coef, False)
            put_symbol(c, states, ss.slice_rct_ry_coef, False)


def read_slice_header(f, ss, c: RangeDecoder):
    """ffv1dec.c:282-359.  ``f`` is the decoder state object."""
    states = _fresh_states()
    g = ss.geom
    sx = get_symbol(c, states, False) * f.width
    sy = get_symbol(c, states, False) * f.height
    sw = (get_symbol(c, states, False) + 1) * f.width + sx
    sh = (get_symbol(c, states, False) + 1) * f.height + sy
    g.x = sx // f.num_h_slices
    g.y = sy // f.num_v_slices
    g.width = sw // f.num_h_slices - g.x
    g.height = sh // f.num_v_slices - g.y
    if not (0 < g.width <= f.width and 0 < g.height <= f.height):
        raise ValueError("bad slice geometry")
    if g.x + g.width > f.width or g.y + g.height > f.height:
        raise ValueError("bad slice geometry")

    qidxs = []
    for _ in range(f.plane_count):
        idx = get_symbol(c, states, False)
        if idx >= f.quant_table_count:
            raise ValueError("quant_table_index out of range")
        qidxs.append(idx)

    ps_val = get_symbol(c, states, False)  # picture structure
    sar_num = get_symbol(c, states, False)
    sar_den = get_symbol(c, states, False)

    info = {"picture_structure": ps_val, "sar": (sar_num, sar_den)}
    if f.version > 3:
        ss.slice_reset_contexts = c.get_rac(states, 0)
        ss.slice_coding_mode = get_symbol(c, states, False)
        if ss.slice_coding_mode != 1:
            ss.slice_rct_by_coef = get_symbol(c, states, False)
            ss.slice_rct_ry_coef = get_symbol(c, states, False)
            if ss.slice_rct_by_coef + ss.slice_rct_ry_coef > 4:
                raise ValueError("slice rct coef out of range")
    return qidxs, info
