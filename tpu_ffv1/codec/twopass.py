"""Two-pass rate/state optimization (the encoder-level "checkpoint"
subsystem, SURVEY §5: cross-run context statistics).

Pass 1 accumulates per-state bit statistics (rc_stat, indexed by state
value; rc_stat2, indexed by (quant_table, context, slot)) while encoding,
then serializes them in the reference's stats text format so streams are
interchangeable with the reference's -pass machinery.

Pass 2 re-derives:
  * a cost-sorted custom state-transition table (sort_stt,
    ffv1enc.c:621-667)
  * per-context tuned initial states via a dynamic program over state
    evolution (find_best_state, ffv1enc.c:139-183)

Behavioral parity: ffv1enc.c:139-183, :621-667, :898-986, :1235-1279.
find_best_state runs in the native tier (ffv1n_find_best_state) as the
same scalar double fold, so tuned tables are bit-identical to the
reference's -pass 2 derivation; the float64 linear-algebra fallback
(used only when the C library cannot build) may differ on ulp ties.
"""
from __future__ import annotations

import math

import numpy as np


class Pass1Stats:
    """Accumulates PASS1 statistics across frames (ffv1enc.c:193-200)."""

    def __init__(self, quant_table_count, context_counts):
        self.rc_stat = np.zeros((256, 2), dtype=np.uint64)
        self.rc_stat2 = [np.zeros((context_counts[i], 32, 2),
                                  dtype=np.uint64)
                         for i in range(quant_table_count)]
        self.gob_count = 0

    def hook(self, qidx: int, context: int):
        rc_stat = self.rc_stat
        rc_stat2 = self.rc_stat2[qidx]

        def per_bit(slot_idx, state_value, bit):
            rc_stat[state_value][bit] += 1
            rc_stat2[context][slot_idx][bit] += 1

        return per_bit

    def serialize(self) -> str:
        """Reference stats_out text format (ffv1enc.c:1261-1276).

        Note: the reference's `snprintf(p, end - p, "\\n")` after the
        rc_stat block (ffv1enc.c:1266) is not followed by `p += strlen`,
        so the newline is overwritten by the next pair and never appears
        in the emitted stats — reproduced here for byte parity.
        """
        parts = []
        for j in range(256):
            parts.append(f"{int(self.rc_stat[j][0])} "
                         f"{int(self.rc_stat[j][1])} ")
        for st2 in self.rc_stat2:
            cc = st2.shape[0]
            for j in range(cc):
                for m in range(32):
                    parts.append(f"{int(st2[j][m][0])} "
                                 f"{int(st2[j][m][1])} ")
        parts.append(f"{self.gob_count}\n")
        return "".join(parts)


def parse_stats(text: str, quant_table_count, context_counts):
    """Parse the stats format back (ffv1enc.c:906-954)."""
    toks = text.split()
    pos = 0

    def take():
        nonlocal pos
        v = int(toks[pos])
        pos += 1
        return v

    rc_stat = np.zeros((256, 2), dtype=np.uint64)
    for j in range(256):
        for i in range(2):
            rc_stat[j][i] = take()
    rc_stat2 = []
    for i in range(quant_table_count):
        st2 = np.zeros((context_counts[i], 32, 2), dtype=np.uint64)
        for j in range(context_counts[i]):
            for k in range(32):
                for m in range(2):
                    st2[j][k][m] = take()
        rc_stat2.append(st2)
    gob_count = take()
    if gob_count <= 0:
        raise ValueError("invalid 2-pass stats (gob_count)")
    return rc_stat, rc_stat2, gob_count


def sort_stt(rc_stat: np.ndarray, stt: np.ndarray) -> bool:
    """Greedy cost-sorting of the state-transition table
    (ffv1enc.c:621-667).  Mutates rc_stat and stt in place."""
    def cost(old, new):
        # float(uint64) -> double is exact below 2**53; math.log2 is the
        # platform libm, matching the reference build's rounding
        return (float(rc_stat[old][0]) * -math.log2((256 - new) / 256.0) +
                float(rc_stat[old][1]) * -math.log2(new / 256.0))

    def cost2(old, new):
        return cost(old, new) + cost(256 - old, 256 - new)

    changed_any = False
    while True:
        changed = False
        for i in range(12, 244):
            for i2 in range(i + 1, min(245, i + 4)):
                size0 = cost2(i, i) + cost2(i2, i2)
                sizex = cost2(i, i2) + cost2(i2, i)
                if size0 - sizex > size0 * 1e-14 and i != 128 and i2 != 128:
                    stt[i], stt[i2] = stt[i2], stt[i]
                    rc_stat[[i, i2]] = rc_stat[[i2, i]]
                    if i != 256 - i2:
                        stt[256 - i], stt[256 - i2] = \
                            stt[256 - i2], stt[256 - i]
                        rc_stat[[256 - i, 256 - i2]] = \
                            rc_stat[[256 - i2, 256 - i]]
                    for j in range(1, 256):
                        if stt[j] == i:
                            stt[j] = i2
                        elif stt[j] == i2:
                            stt[j] = i
                        if i != 256 - i2:
                            if stt[256 - j] == 256 - i:
                                stt[256 - j] = 256 - i2
                            elif stt[256 - j] == 256 - i2:
                                stt[256 - j] = 256 - i
                    changed = changed_any = True
        if not changed:
            break
    return changed_any


def find_best_state(one_state: np.ndarray) -> np.ndarray:
    """DP over state evolution (ffv1enc.c:139-183).

    best_state[p8][count]: best initial state for a context whose one-bit
    probability is p8/256 and expected occurrence count is ``count``.
    Runs in the native tier (exact double-fold FP order, so the result is
    bit-identical to the reference's); falls back to the float64
    linear-algebra evaluation if the C library is unavailable.
    """
    one_state = np.asarray(one_state, dtype=np.int64)
    try:
        from ..native import get_lib
        import ctypes as ct
        lib = get_lib()
        lib.ffv1n_find_best_state.argtypes = [ct.c_void_p, ct.c_void_p]
        lib.ffv1n_find_best_state.restype = None
        one_u8 = np.ascontiguousarray(one_state, dtype=np.uint8)
        best = np.zeros((256, 256), dtype=np.uint8)
        lib.ffv1n_find_best_state(one_u8.ctypes.data, best.ctypes.data)
        return best
    except Exception:
        pass
    l2tab = np.zeros(256)
    l2tab[1:] = np.log2(np.arange(1, 256) / 256.0)

    # transition matrices: occ' = occ @ (p*P1 + (1-p)*P0)
    P1 = np.zeros((256, 257))
    P0 = np.zeros((256, 257))
    for m in range(1, 256):
        P1[m, one_state[m]] += 1.0
        P0[m, 256 - one_state[256 - m]] += 1.0
    P1 = P1[:, :256]
    P0 = P0[:, :256]

    best_state = np.zeros((256, 256), dtype=np.uint8)
    for i in range(256):
        p = i / 256.0
        cvec = np.zeros(256)
        cvec[1:] = p * l2tab[1:] + (1 - p) * l2tab[255:0:-1]
        M = p * P1 + (1 - p) * P0
        js = [j for j in range(max(i - 10, 1), min(i + 11, 256))
              if one_state[j]]
        if not js:
            continue
        occ = np.zeros((len(js), 256))
        occ[np.arange(len(js)), js] = 1.0
        lens = np.zeros(len(js))
        best_len = np.full(256, float(1 << 30))
        for k in range(256):
            lens = lens - occ @ cvec
            if (lens < best_len[k]).any():
                # C iterates j outer / k inner with strict '<': for each k
                # the earliest j achieving the running minimum wins
                cur = best_len[k]
                for jj in range(len(js)):
                    if lens[jj] < cur:
                        cur = lens[jj]
                        best_state[i][k] = js[jj]
                best_len[k] = cur
            occ = occ @ M
    return best_state


def _c_round(p: float) -> int:
    """C round(): half away from zero (Python round() is half-to-even)."""
    return math.floor(p + 0.5) if p >= 0 else math.ceil(p - 0.5)


def _clip(v, lo, hi):
    return lo if v < lo else hi if v > hi else v


def build_initial_states(rc_stat2_list, gob_count, best_state,
                         context_counts):
    """Derive tuned per-context initial states (ffv1enc.c:960-984).

    The count index is av_clip_uint8((a+b)/gob_count): the double is
    truncated toward zero by the int conversion, THEN clipped.
    """
    out = []
    for i, st2 in enumerate(rc_stat2_list):
        cc = context_counts[i]
        init = np.full((cc, 32), 128, dtype=np.uint8)
        for k in range(32):
            a = 0.0
            b = 0.0
            jp = 0
            for j in range(cc):
                p = 128.0
                s0 = float(st2[j][k][0])
                s1 = float(st2[j][k][1])
                if (s0 + s1 > 200 and j) or a + b > 200:
                    if a + b:
                        p = 256.0 * b / (a + b)
                    init[jp][k] = best_state[
                        _clip(_c_round(p), 1, 255)][
                        _clip(int((a + b) / gob_count), 0, 255)]
                    jp += 1
                    while jp < j:
                        init[jp][k] = init[jp - 1][k]
                        jp += 1
                    a = b = 0.0
                a += s0
                b += s1
                if a + b:
                    p = 256.0 * b / (a + b)
                init[j][k] = best_state[
                    _clip(_c_round(p), 1, 255)][
                    _clip(int((a + b) / gob_count), 0, 255)]
        out.append(init)
    return out
