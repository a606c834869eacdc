"""Pallas TPU kernel for FFV1 decode (range coder, planar, coded
widths 1..17: the distinct-slot schedule at <= 10 bits, the extended
running-row schedule above — mirroring the encode kernel pair).

Decode is pixel-serial per slice (each reconstructed sample feeds the
next pixel's context), so throughput comes from LANES: L independent
slice streams (slices x stream batch) advance one pixel per step, all
state in VMEM.  This is the decode mirror of rc_pallas.py and replaces
the XLA lane scan (dec_scan_lanes.py), whose per-step state-row scatter
costs ~0.6 us x L on XLA:TPU (measured 83 us/pixel-step at L=96).

Key structures (per-lane, resident across the plane):
  * adaptive states: (L, CC, 128) int8 VMEM scratch, one context row
    per sublane (the encode kernel's layout).  The row address is
    data-dependent (computed from reconstructed neighbors), so the ctx
    vector is stored to a VMEM scratch and read back as SCALARS to
    drive the per-lane dynamic slices — scalar VMEM reads of computed
    vectors work on v5e Mosaic (probed); scalar VMEM stores do not, so
    scalar->vector assembly uses (iota == lane) accumulation.
  * byte FIFO: a 32-row WORD window (32, L) int32 = 128 bytes of
    lookahead per lane, insert row (fill >> 2) & 31.  The per-lane
    scalar sweep that fetches stream words is the kernel's main O(L)
    cost, so feeding is PACED: one unconditional word round every
    other pixel (2 B/px vs ~1.3 B/px typical consumption) plus a rare
    catch-up burst behind a 48-byte low-water check (> 2 pixels'
    worst case of 2*e_max+3 <= 21 renorm bytes each at 10 bits).  In-window byte reads are a word-row one-hot
    reduction + per-lane subword shift.
  * reconstruction rows: the previous row is read per 8-pixel group
    BEFORE the current row overwrites it; the 5-input context model
    keeps a second ring row (y-2) for the TT neighbor, shifted at
    group granularity (3-row ring, ffv1enc.c:377).  The right-edge RT
    clamp (ffv1dec.c:202-203) is realized by replicating the last real
    sample into the row padding.
  * table lookups (quant tables, state transitions): arithmetic
    binary-select trees over (256, 1) VMEM tables, as in the encode
    kernel; transitions use the single-table identity
    zero[s] = (256 - one[(256-s) & 0xFF]) & 0xFF (rangecoder.c).

Pixels run in 8-groups so all row-buffer accesses are 8-aligned dynamic
slices with static in-group offsets (Mosaic requirement); group pad
pixels (x >= w) are exact no-ops that replicate the last real sample.
Grid is sequential over rows; one pallas_call per plane, chaining
(states, low, range, pos) through outputs.

Behavioral parity: ffv1dec.c:42-63 (get_symbol), :100-181
(decode_line), rangecoder.h:104-145 (get_rac/refill).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
# pl.ANY replaced pltpu.ANY in newer jax; support both
_ANY = getattr(pl, "ANY", None) or pltpu.ANY


def _kernel(bits, L, w, h, Wpad, capw, pbase, five, wide, gather,
            bufs_ref, t1_ref, qt0_ref, qt1_ref, qt2_ref, qt3_ref,
            qt4_ref, states0_ref,
            low0_ref, rng0_ref, pos0_ref,
            out_ref, lowout_ref, rngout_ref, posout_ref, statesout_ref,
            states, rowbuf, rowbuf2, lows, rngs, poss, win, fills,
            plft_ref, ctxv, minf, lkbuf, stage, dsem):
    y = pl.program_id(0)
    sdt = jnp.int32 if wide else jnp.int8
    SCH = stage.shape[0]
    e_max = bits - 1
    mask_v = (1 << bits) - 1
    ngroups = Wpad // 8

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    iota32s = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lane_lt32 = lane128 < 32
    # f32 operands: the bf16 identity trips a Mosaic broadcast
    # verification error in this kernel's shapes (bf16 32x32 -> f32);
    # values <= 255 are exact in either type
    eye32 = (jax.lax.broadcasted_iota(jnp.int32, (32, 32), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (32, 32), 1)) \
        .astype(jnp.float32)

    def tree(tab_ref, idx):
        """tab[idx] for (1, L) idx in [0, 255]: one lane-dimension
        dynamic_gather over the row-form table + an arithmetic select
        on the high bit (~7 VPU ops vs ~100 for the round-2 sublane
        binary-select tree, kept below as the FFV1_PALLAS_GATHER=0
        fallback; the table is shared across lanes, so its entries
        live in the LANE axis — see rc_pallas.lookup_one).

        Mosaic rejects dynamic_gather on 1-sublane operands ("Shape
        mismatch in input, indices and output" — the round-3/4 'gather
        broken' regression; scripts/probes/gather_probe4.py), so the
        (2, 128) lo/hi table tiles to (8, 128) and ONE legal 8-sublane
        gather yields both halves."""
        if gather:
            t8 = jnp.concatenate([tab_ref[...]] * 4, axis=0)  # (8, 128)
            i7 = idx & 127
            if L != 128:
                # pad to the 128-lane gather width through the staging
                # row: a zero-concat here trips Mosaic layout inference
                # in this kernel's context ("result/input offset
                # mismatch on non-concat dimension"); a store/load
                # round trip canonicalizes the layout, and the & 127
                # re-mask bounds the stale pad lanes
                lkbuf[0:1, pl.ds(0, L)] = i7
                i7 = lkbuf[0:1, :] & 127
            g = jnp.take_along_axis(
                t8, jnp.broadcast_to(i7, (8, 128)), axis=1)
            g_lo, g_hi = g[0:1, :], g[1:2, :]
            if L != 128:
                g_lo = g_lo[:, :L]
                g_hi = g_hi[:, :L]
            return g_lo + (g_hi - g_lo) * ((idx >> 7) & 1)
        lo = tab_ref[pl.ds(0, 128), :]
        hi = tab_ref[pl.ds(128, 128), :]
        c = lo + (hi - lo) * ((idx >> 7) & 1)
        c = c[:64, :] + (c[64:, :] - c[:64, :]) * ((idx >> 6) & 1)
        c = c[:32, :] + (c[32:, :] - c[:32, :]) * ((idx >> 5) & 1)
        c = c[:16, :] + (c[16:, :] - c[:16, :]) * ((idx >> 4) & 1)
        c = c[:8, :] + (c[8:, :] - c[:8, :]) * ((idx >> 3) & 1)
        d = iota8 - (idx & 7)
        return jnp.sum(c * jnp.maximum(0, 1 - d * d), axis=0,
                       keepdims=True)

    def transition(s, b):
        idx = jnp.where(b == 1, s, (256 - s) & 0xFF)
        t = tree(t1_ref, idx)
        return jnp.where(b == 1, t, (256 - t) & 0xFF)

    def feed_block(p):
        """Insert an 8-word (32-byte) block into each lane's WORD
        window — (32, L) int32 rows = 128 bytes of lookahead, rows
        (fill >> 2) & 31 .. +8 (8-aligned: fills advance in 32-byte
        steps from a 32-aligned start, so the dynamic slices satisfy
        Mosaic's alignment rule and one block lands per lane in ~5 ops
        instead of 8 x ~5 for the old per-word rounds — the per-lane
        feed sweep was the kernel's main O(L) cost after the state
        loops).

        ``p`` must be the CURRENT read position (the loop-carried
        value).  The capacity guard (fill - pos <= 96) keeps the 8
        inserted rows strictly ahead of the read row."""
        fp = fills[pl.ds(0, 1), :]
        do = (fp - p) <= 96                       # (1, L) vector mask
        for lane in range(L):
            wi = fills[0, lane] >> 2              # 8-aligned word row
            base = pl.multiple_of(
                jnp.minimum(wi, capw - 8) & ~7, 8)
            wv = bufs_ref[pl.ds(base, 8), lane:lane + 1]   # (8, 1)
            row = pl.multiple_of((wi & 31) & ~7, 8)
            m = (lane_iota == lane) & do          # (1, L)
            cur = win[pl.ds(row, 8), :]
            win[pl.ds(row, 8), :] = jnp.where(m, wv, cur)
        fills[pl.ds(0, 1), :] = jnp.where(do, fp + 32, fp)

    @pl.when(y == 0)
    def _init():
        # states0 lives in HBM (ANY) and streams through the staging
        # buffer — see rc_pallas.py: the wide int32 scratch needs the
        # VMEM the whole-plane int8 in/out copies would pin
        for k in range(L // SCH):
            dma = pltpu.make_async_copy(
                states0_ref.at[pl.ds(k * SCH, SCH)], stage, dsem)
            dma.start()
            dma.wait()
            states[pl.ds(k * SCH, SCH)] = stage[...].astype(sdt)
        lows[...] = low0_ref[...]
        rngs[...] = rng0_ref[...]
        poss[...] = pos0_ref[...]
        # 32-aligned start so block inserts stay 8-row aligned
        fills[pl.ds(0, 1), :] = pos0_ref[...] & ~31
        win[...] = jnp.zeros((32, L), jnp.int32)
        for _ in range(4):
            feed_block(pos0_ref[...])
        plft_ref[...] = jnp.zeros((1, L), jnp.int32)
        rowbuf[...] = jnp.zeros((Wpad + 16, L), jnp.int32)
        rowbuf2[...] = jnp.zeros((Wpad + 16, L), jnp.int32)

    # row borders (ffv1dec.c:202-203): cur[-1] = prev row's [0];
    # prev[-1] = two-rows-ago [0] (carried scalar row)
    cl = rowbuf[pl.ds(0, 1), :]
    plft = plft_ref[pl.ds(0, 1), :]
    plft_ref[...] = cl

    low0v = lows[pl.ds(0, 1), :]
    rng0v = rngs[pl.ds(0, 1), :]
    pos0v = poss[pl.ds(0, 1), :]

    def posT_eq(ridx):
        return iota32s == ridx

    def group(gi, carry):
        low, rng, pos, vprev, tprev, vprev2 = carry
        x8 = pl.multiple_of(gi * 8, 8)
        prev16 = jnp.concatenate(
            [rowbuf[pl.ds(x8, 8), :], rowbuf[pl.ds(x8 + 8, 8), :]], 0)
        if five:
            # 3-row ring (ffv1enc.c:377): rowbuf2 holds y-2; the y-1
            # values shift into it before the current row overwrites
            # rowbuf (group granularity)
            tt8 = rowbuf2[pl.ds(x8, 8), :]
            rowbuf2[pl.ds(x8, 8), :] = rowbuf[pl.ds(x8, 8), :]
        decoded = []

        for px in range(8):
            # paced feed: one unconditional 32-byte block insert per
            # 8-pixel group (4 B/px of feed vs ~1.3 B/px typical
            # consumption), plus a low-water check every other pixel
            # triggering a 64-byte catch-up — worst-case consumption
            # between checks is 2 x (2*e_max+3) bytes: <= 42 at 10
            # bits, <= 70 at the 17-bit ext ceiling, so an 88-byte
            # floor at each check keeps reads strictly behind the fill
            # even on pathological streams
            if px == 0:
                feed_block(pos)
            if px % 2 == 0:
                minf[0, 0] = jnp.min(fills[pl.ds(0, 1), :] - pos)

                @pl.when(minf[0, 0] < 88)
                def _():
                    feed_block(pos)
                    feed_block(pos)

            T = prev16[px:px + 1, :]
            RT = prev16[px + 1:px + 2, :]
            Lv = vprev
            LT = tprev
            act_px = (gi * 8 + px) < w               # scalar bool

            ctx = (tree(qt0_ref, (Lv - LT) & 0xFF) +
                   tree(qt1_ref, (LT - T) & 0xFF) +
                   tree(qt2_ref, (T - RT) & 0xFF))
            if five:
                TT = tt8[px:px + 1, :]
                LLv = vprev2
                ctx = ctx + tree(qt3_ref, (LLv - Lv) & 0xFF) + \
                    tree(qt4_ref, (TT - T) & 0xFF)
            csign = ctx < 0
            ctx = jnp.where(csign, -ctx, ctx)
            # clamp so damaged streams can't address out of the padded
            # state table (damage is detected downstream by the
            # sentinel/byte-count check, ffv1dec.c:459-467)
            CCrows = states0_ref.shape[1]
            ctxv[pl.ds(0, 1), :] = jnp.clip(ctx + pbase, 0, CCrows - 1)

            # ---- state row read (per-lane scalar addressing) ----
            row_list = []
            blocks = []
            subs = []
            bases = []
            for lane in range(L):
                ci = ctxv[0, lane]
                base = pl.multiple_of((ci >> 3) * 8, 8)
                bases.append(base)
                block = states[lane, pl.ds(base, 8), :]
                sub = ci & 7
                if wide and gather:
                    # one dim-0 (8, 128) int32 gather (see rc_pallas)
                    rowfull = jnp.take_along_axis(
                        block, jnp.broadcast_to(sub, (8, 128)),
                        axis=0)[0:1]
                else:
                    rowfull = jnp.sum(
                        jnp.where(iota8 == sub, block, 0),
                        axis=0, keepdims=True)
                row_list.append(rowfull[:, :32])
                blocks.append(block)
                subs.append(sub)
            rows8 = jnp.concatenate(row_list, 0)          # (L, 32) int8
            rowsT = jax.lax.dot_general(
                eye32, rows8.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32) \
                & 0xFF                                    # (32, L)

            def win_byte(p):
                row = (p >> 2) & 31                    # (1, L)
                if gather:
                    # word-row select: 4 static (8, L) window quarters,
                    # each resolved by ONE dim-0 dynamic_gather (the
                    # only sublane-gather shape v5e Mosaic compiles is
                    # (8, 128) int32 — probed), then a 2-level
                    # arithmetic select on the quarter index.  ~12 ops
                    # on 1-vreg operands vs ~26 for the (32, L) one-hot
                    # reduce this replaces; win_byte runs once per rac
                    # step (~17-21x per pixel), so it is the chain's
                    # single largest vector cost.
                    sub = jnp.broadcast_to(row & 7, (8, L))
                    g = [jnp.take_along_axis(
                        win[pl.ds(8 * k, 8), :], sub, axis=0)[0:1, :]
                        for k in range(4)]
                    b3 = (row >> 3) & 1
                    b4 = (row >> 4) & 1
                    c0 = g[0] + (g[1] - g[0]) * b3
                    c1 = g[2] + (g[3] - g[2]) * b3
                    word = c0 + (c1 - c0) * b4
                else:
                    d = iota32s - row
                    word = jnp.sum(win[...] * jnp.maximum(0, 1 - d * d),
                                   axis=0, keepdims=True)
                return (word >> ((p & 3) * 8)) & 0xFF

            def rac(s, low, rng, pos, act):
                # NOTE: no state transition here — the decision chain is
                # the kernel's serial critical path, and state indices
                # touched within one pixel are pairwise distinct (same
                # property the encode kernel uses), so all transitions
                # are deferred and batched after the chain
                r1 = (rng * s) >> 8
                r0 = rng - r1
                bit = low >= r0
                low = jnp.where(act, jnp.where(bit, low - r0, low), low)
                rng = jnp.where(act, jnp.where(bit, r1, r0), rng)
                need = act & (rng < 0x100)
                nxt = win_byte(pos)
                low = jnp.where(need, (low << 8) + nxt, low)
                rng = jnp.where(need, rng << 8, rng)
                pos = pos + need.astype(jnp.int32)
                return bit & act, low, rng, pos

            ones = jnp.broadcast_to(act_px, (1, L))
            stat_steps = {}     # static row -> (mask, s, bit)
            dyn_steps = []      # (rowsel (32,L), mask, s, bit)

            s = rowsT[0:1, :]
            b0, low, rng, pos = rac(s, low, rng, pos, ones)
            stat_steps[0] = (ones, s, b0.astype(jnp.int32))
            nz = ~b0 & ones
            e = jnp.zeros((1, L), jnp.int32)
            done = ~nz
            s10 = s31 = None
            if bits <= 10:
                for j in range(e_max + 1):
                    s = rowsT[1 + j:2 + j, :]
                    bit, low, rng, pos = rac(s, low, rng, pos, ~done)
                    stat_steps[1 + j] = (~done, s, bit.astype(jnp.int32))
                    e = e + (bit & ~done).astype(jnp.int32)
                    done = done | ~bit
            else:
                # extended schedule (coded widths 11..17): the FFMIN
                # row caps (1+min(j,9), 22+min(i,9); ffv1dec.c:53 /
                # dec_scan_lanes.py:161-175) give rows 10 and 31
                # SEVERAL decisions per pixel — those two rows carry
                # RUNNING states transitioned inline through the chain
                # (the encode ext kernel's scheme, rc_pallas.py);
                # single-touch rows keep the deferred batch adaptation.
                s10 = rowsT[10:11, :]
                for j in range(e_max + 1):
                    act = ~done
                    s = rowsT[1 + j:2 + j, :] if j <= 8 else s10
                    bit, low, rng, pos = rac(s, low, rng, pos, act)
                    bi = bit.astype(jnp.int32)
                    if j <= 8:
                        stat_steps[1 + j] = (act, s, bi)
                    else:
                        s10 = jnp.where(act, transition(s10, bi), s10)
                    e = e + (bit & act).astype(jnp.int32)
                    done = done | ~bit
                s31 = rowsT[31:32, :]
            aval = jnp.ones((1, L), jnp.int32)
            for j in range(e_max):
                actj = nz & (j < e)
                iclip = jnp.clip(e - 1 - j, 0, 9)
                msel = posT_eq(22 + iclip)
                s = jnp.sum(rowsT * msel, axis=0, keepdims=True)
                if bits > 10:
                    # lanes at the cap read/advance the running row 31
                    use31 = iclip == 9
                    s = jnp.where(use31, s31, s)
                bit, low, rng, pos = rac(s, low, rng, pos, actj)
                bi = bit.astype(jnp.int32)
                if bits > 10:
                    s31 = jnp.where(use31 & actj, transition(s31, bi),
                                    s31)
                    dyn_steps.append((msel & ~use31, actj, s, bi))
                else:
                    dyn_steps.append((msel, actj, s, bi))
                aval = jnp.where(actj, aval + aval + bi, aval)
            ridx = 11 + jnp.minimum(e, 10)
            msel = posT_eq(ridx)
            s = jnp.sum(rowsT * msel, axis=0, keepdims=True)
            sbit, low, rng, pos = rac(s, low, rng, pos, nz)
            dyn_steps.append((msel, nz, s, sbit.astype(jnp.int32)))

            # ---- deferred transitions + write-back ----
            news = {p: (m, transition(s_, b_))
                    for p, (m, s_, b_) in stat_steps.items()}
            base_rows = rowsT
            for msel, actj, s_, b_ in dyn_steps:
                ns = transition(s_, b_)
                base_rows = jnp.where(msel & actj, ns, base_rows)
            rows_new = []
            for p in range(32):
                if bits > 10 and p == 10:
                    rows_new.append(s10)
                elif bits > 10 and p == 31:
                    rows_new.append(s31)
                elif p in news:
                    m, ns = news[p]
                    rows_new.append(jnp.where(m, ns, base_rows[p:p + 1]))
                else:
                    rows_new.append(base_rows[p:p + 1])
            new_rowsT = jnp.concatenate(rows_new, 0)
            new_rows8 = jax.lax.dot_general(
                new_rowsT.astype(jnp.float32), eye32,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32) \
                & 0xFF
            new_rows8 = new_rows8.astype(sdt)
            if L % 8:
                new_rows8 = jnp.concatenate(
                    [new_rows8, jnp.zeros((8 - L % 8, 32), sdt)], 0)
            # lane-replicate once; wmask's lane_lt32 keeps the merge to
            # the real 32 slots (see rc_pallas.py write loop)
            new_rows128 = jnp.concatenate([new_rows8] * 4, axis=1)
            for lane in range(L):
                base = bases[lane]  # reuse the read loop's scalar fetch
                # static single-sublane slice (see rc_pallas.py)
                nr128 = new_rows128[lane:lane + 1, :]
                wmask = (iota8 == subs[lane]) & lane_lt32
                nb = jnp.where(wmask, nr128, blocks[lane])
                states[lane, pl.ds(base, 8), :] = nb

            diff = jnp.where(nz, jnp.where(sbit, -aval, aval), 0)
            diff = jnp.where(csign, -diff, diff)
            m2 = Lv + T - LT
            pred = (Lv + m2 + T) - \
                jnp.minimum(jnp.minimum(Lv, m2), T) - \
                jnp.maximum(jnp.maximum(Lv, m2), T)
            val = (pred + diff) & mask_v
            if bits == 16:
                # int16_t sample-row storage wrap (dec_scan_lanes.py
                # :189-193; the C ring rows are int16_t, so 16-bit
                # samples go negative and the median compares signed)
                val = ((val + 0x8000) & 0xFFFF) - 0x8000
            val = jnp.where(ones, val, vprev)   # pad: replicate last
            decoded.append(val)
            vprev2 = jnp.where(ones, Lv, vprev2)
            vprev = val
            tprev = jnp.where(ones, T, tprev)

        rowbuf[pl.ds(x8, 8), :] = jnp.concatenate(decoded, 0)
        out_ref[0, pl.ds(x8, 8), :] = jnp.concatenate(decoded, 0)
        return (low, rng, pos, vprev, tprev, vprev2)

    ll0 = jnp.zeros((1, L), jnp.int32)   # LL border: 0 at x=0, cl at x=1
    low, rng, pos, vlast, _, _ = jax.lax.fori_loop(
        0, ngroups, group, (low0v, rng0v, pos0v, cl, plft, ll0))
    # replicate the last real sample once more past Wpad so RT at
    # x = w-1 reads it on the next row even when w % 8 == 0
    rowbuf[pl.ds(Wpad, 8), :] = jnp.broadcast_to(vlast, (8, L))
    lows[pl.ds(0, 1), :] = low
    rngs[pl.ds(0, 1), :] = rng
    poss[pl.ds(0, 1), :] = pos

    @pl.when(y == h - 1)
    def _fin():
        lowout_ref[...] = lows[...]
        rngout_ref[...] = rngs[...]
        posout_ref[...] = poss[...]
        for k in range(L // SCH):
            stage[...] = states[pl.ds(k * SCH, SCH)].astype(jnp.int8)
            dma = pltpu.make_async_copy(
                stage, statesout_ref.at[pl.ds(k * SCH, SCH)], dsem)
            dma.start()
            dma.wait()


def _dec_plane_call(bufw, states_pad, t1, qt0, qt1, qt2, qt3, qt4,
                    low, rng, pos, w, h, pbase, bits, L, CC, five,
                    gather=None):
    Wpad = -(-w // 8) * 8
    capw = bufw.shape[0]
    import os as _os
    # decode measured ~10% SLOWER with the int32 scratch (unlike
    # encode): its group-serial body already hides the int8 repack
    # latency, while the 4x scratch pressures the row/window buffers.
    # The HBM-staged states IO is kept (pure VMEM win); wide is opt-in.
    wide = _os.environ.get("FFV1_PALLAS_DEC_WIDE", "0") \
        not in ("0", "false")
    if gather is None:
        gather = (_os.environ.get("FFV1_PALLAS_GATHER", "1")
                  not in ("0", "false"))
    gather = gather and L <= 128
    SCH = next(c for c in (8, 4, 2, 1) if L % c == 0)
    kernel = functools.partial(_kernel, bits, L, w, h, Wpad, capw, pbase,
                               five, wide, gather)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 +
                 [pl.BlockSpec(memory_space=_ANY)] +   # states (HBM)
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[
            pl.BlockSpec((1, Wpad, L), lambda y: (y, 0, 0),
                         memory_space=pltpu.VMEM),   # plane rows
            pl.BlockSpec(memory_space=pltpu.VMEM),   # low
            pl.BlockSpec(memory_space=pltpu.VMEM),   # range
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pos
            pl.BlockSpec(memory_space=_ANY),    # states (HBM)
        ],
        scratch_shapes=[
            pltpu.VMEM((L, CC, 128),
                       jnp.int32 if wide else jnp.int8),  # states
            pltpu.VMEM((Wpad + 16, L), jnp.int32),   # row buffer
            pltpu.VMEM((Wpad + 16, L), jnp.int32),   # y-2 row (5-input)
            pltpu.VMEM((1, L), jnp.int32),           # low
            pltpu.VMEM((1, L), jnp.int32),           # range
            pltpu.VMEM((1, L), jnp.int32),           # pos
            pltpu.VMEM((32, L), jnp.int32),          # word window
            pltpu.VMEM((1, L), jnp.int32),           # window fill pos
            pltpu.VMEM((1, L), jnp.int32),           # prev-prev left
            pltpu.VMEM((1, L), jnp.int32),           # ctx scalarizer
            pltpu.SMEM((1, 1), jnp.int32),           # min fill
            pltpu.VMEM((8, 128), jnp.int32),         # gather-pad row
            pltpu.VMEM((SCH, CC, 128), jnp.int8),    # DMA staging
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=116 << 20),
        out_shape=[
            jax.ShapeDtypeStruct((h, Wpad, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((L, CC, 128), jnp.int8),
        ],
    )(bufw, t1, qt0, qt1, qt2, qt3, qt4, states_pad, low, rng, pos)


@functools.partial(jax.jit,
                    static_argnames=("plane_specs", "bits", "five",
                                     "gather"))
def rc_decode_planes_pallas(bufs, states, one_tab, zero_tab, qt,
                            low0, range0, pos0, plane_specs: tuple,
                            bits: int, five: bool = False,
                            gather=None):
    """Decode all planes of L parallel slice streams (Pallas kernel).

    Same contract as dec_scan_lanes.rc_decode_planes_lanes; ``five``
    selects the 5-input context model (TT/LL neighbors via a second
    ring row).  bufs: uint8[L, cap] (cap padded to 4);
    states: uint8[L, CC_total, 32].
    """
    L, CC_real = states.shape[0], states.shape[1]
    cap = bufs.shape[1]
    assert cap % 4 == 0
    # little-endian int32 word view, transposed to (capw, L) so a
    # lane's words sit on the sublane axis for scalar reads
    b = bufs.astype(jnp.int32).reshape(L, cap // 4, 4)
    words = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) |
             (b[..., 3] << 24))
    bufw = words.T                                   # (capw, L)

    NB = -(-CC_real // 8)
    CC = NB * 8
    states_pad = jnp.pad(states.astype(jnp.int8),
                         ((0, 0), (0, CC - CC_real), (0, 96)))
    # (2, 128) row form for the lane-gather lookups (see tree());
    # (256, 1) sublane column form for the tree fallback
    import os as _os
    # gather=None takes the env default; False selects the tree form
    # (staged lowering-failure retry, see tpu/encoder._dispatch_staged)
    if gather is None:
        gather = (_os.environ.get("FFV1_PALLAS_GATHER", "1")
                  not in ("0", "false"))
    gather = gather and L <= 128
    shp = (2, 128) if gather else (256, 1)
    t1 = one_tab.astype(jnp.int32).reshape(shp)
    del zero_tab   # derived via the single-table identity
    qt0 = qt[0].reshape(shp)
    qt1 = qt[1].reshape(shp)
    qt2 = qt[2].reshape(shp)
    qt3 = qt[3].reshape(shp)
    qt4 = qt[4].reshape(shp)

    low = low0[None, :].astype(jnp.int32)
    rng = range0[None, :].astype(jnp.int32)
    pos = pos0[None, :].astype(jnp.int32)
    planes = []
    sp = states_pad
    for (w, h, pbase) in plane_specs:
        out, low, rng, pos, sp = _dec_plane_call(
            bufw, sp, t1, qt0, qt1, qt2, qt3, qt4, low, rng, pos,
            w, h, pbase, bits, L, CC, five, gather)
        planes.append(jnp.moveaxis(out[:, :w, :], 2, 0))   # (L, h, w)
    states_out = sp[:, :CC_real, :32].astype(jnp.uint8)
    return tuple(planes), states_out, low[0], rng[0], pos[0]
