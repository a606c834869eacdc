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
find_best_state is evaluated with float64 linear algebra in the same
recurrence; FP summation order differs from the scalar C loop, so tuned
tables may differ in ulp-sensitive ties — output streams remain valid
and self-consistent either way.
"""
from __future__ import annotations

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
        """Reference stats_out text format (ffv1enc.c:1261-1276)."""
        parts = []
        for j in range(256):
            parts.append(f"{int(self.rc_stat[j][0])} "
                         f"{int(self.rc_stat[j][1])} ")
        parts.append("\n")
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
    rc = rc_stat.astype(np.float64)

    def cost(old, new):
        return (rc_stat[old][0] * -np.log2((256 - new) / 256.0) +
                rc_stat[old][1] * -np.log2(new / 256.0))

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
    _ = rc
    return changed_any


def find_best_state(one_state: np.ndarray) -> np.ndarray:
    """DP over state evolution (ffv1enc.c:139-183), vectorized.

    best_state[p8][count]: best initial state for a context whose one-bit
    probability is p8/256 and expected occurrence count is ``count``.
    """
    one_state = np.asarray(one_state, dtype=np.int64)
    l2tab = np.zeros(256)
    l2tab[1:] = np.log2(np.arange(1, 256) / 256.0)

    # transition matrices: occ' = occ @ (p*P1 + (1-p)*P0)
    P1 = np.zeros((256, 256))
    P0 = np.zeros((256, 256))
    for m in range(1, 256):
        P1[m, one_state[m]] += 1.0
        P0[m, 256 - one_state[256 - m]] += 1.0

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


def build_initial_states(rc_stat2_list, gob_count, best_state,
                         context_counts):
    """Derive tuned per-context initial states (ffv1enc.c:960-984)."""
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
                        int(np.clip(round(p), 1, 255))][
                        int(np.clip((a + b) / gob_count, 0, 255))]
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
                    int(np.clip(round(p), 1, 255))][
                    int(np.clip((a + b) / gob_count, 0, 255))]
        out.append(init)
    return out
