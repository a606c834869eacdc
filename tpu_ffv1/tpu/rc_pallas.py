"""Pallas TPU kernel for the adaptive range-coder scan (encode).

The XLA lax.scan formulation (rc_scan_lanes.py) is bounded by per-step
dispatch of the state-row gather/scatter (dynamic indices force XLA:TPU
into slow scatter lowerings).  This kernel keeps the per-lane context
state tables resident in VMEM and addresses rows with *scalar* indices
read from SMEM — the TPU-native way to do data-dependent addressing —
while the per-pixel decision masks, state transitions and the low/range
chain stay vectorized over lanes.

Layout notes:
  * states: (L, CC, 128) int8 in VMEM scratch — the 32-byte context row
    padded to the 128-lane tile; int8 keeps it at ~4 MB for 24 lanes of
    the 3-input model x 2 plane groups.
  * ctx stream: SMEM block (scalar reads drive the row addressing).
  * diff/act streams: VMEM blocks (vector math).
  * per-chunk outputs: provisional values packed with the valid flag
    (bit 20) and the low-byte carry flag (bit 16), shaped (CH, S, L).

State transitions (round-2 design — the round-1 (L*32, 256) one-hot +
two (256, 1) matvecs measured ~67% of kernel time):
  * every transition is new = bit ? one[s] : zero[s]; the normative
    table identity zero[s] = (256 - one[(256-s) & 0xFF]) & 0xFF
    (rangecoder.c ff_build_rac_states / ffv1.c:95-101 custom tables)
    reduces it to ONE table: t = one[bit ? s : 256-s],
    new = bit ? t : 256-t.
  * the one[idx] lookup for a (1, L) row vector is a 5-level
    binary-select tree over 8-aligned sublane halves of the (256, 1)
    table ((128,L) -> (64,L) -> ... -> (8,L)) plus one masked 8-sublane
    reduction — ~10 small VPU ops instead of a 786K-element compare.
  * only CODED positions transition: the static exponent/mantissa/zero
    slots (chain_order_nosign) get one tree each, and the e_max+1 sign
    candidates collapse to ONE dynamic step (state row picked by a
    (posT == 11+e) masked reduction) since exactly one is active per
    nonzero pixel — this also shrinks the output slots S by ~30%.

Grid is sequential over pixel chunks; scratch (states, low, range)
persists across grid steps.  Outputs feed the same finalize_* compaction
as the XLA path.

STATUS: byte-exact vs the XLA kernel under the Pallas TPU interpreter
(tests/test_pallas.py) and on real v5e.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
# pl.ANY replaced pltpu.ANY in newer jax; support both
_ANY = getattr(pl, "ANY", None) or pltpu.ANY

from .rc_scan_fast import chain_order_nosign


def _kernel(bits, L, CC, CH, S, order, compact, wide, gather,
            ctx_ref, diff_ref, act_ref, t1_ref, states0_ref,
            low0_ref, rng0_ref,
            prov_ref, lowout_ref, rngout_ref, statesout_ref,
            states, lowv, rngv, stage, dsem):
    # FFV1_PALLAS_ABLATE stubs out one pixel-body stage for on-HW cost
    # attribution (scripts/probes/ablate4.py); output is GARBAGE with
    # any value set — timing-only, never production
    import os as _os3
    _ablate = _os3.environ.get("FFV1_PALLAS_ABLATE", "")
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    sdt = jnp.int32 if wide else jnp.int8
    # states0/statesout live in HBM (memory_space=ANY): keeping the
    # (L, CC, 128) int8 planes VMEM-resident costs 2 x L*CC*128 bytes of
    # scoped VMEM for two single-use copies; instead they stream through
    # a small staging buffer at init/fin (the int32 scratch at 120 lanes
    # already needs ~80 MB of the 128 MB budget)
    SCH = stage.shape[0]

    @pl.when(step == 0)
    def _init():
        for k in range(L // SCH):
            dma = pltpu.make_async_copy(
                states0_ref.at[pl.ds(k * SCH, SCH)], stage, dsem)
            dma.start()
            dma.wait()
            states[pl.ds(k * SCH, SCH)] = stage[...].astype(sdt)
        lowv[...] = low0_ref[...]
        rngv[...] = rng0_ref[...]

    posT = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    # transpose-by-matmul basis: Mosaic has no general 2-D transpose, but
    # rowsT = I32 @ rows^T is one tiny MXU op (values <= 255, exact in
    # bf16/f32)
    eye32 = (jax.lax.broadcasted_iota(jnp.int32, (32, 32), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (32, 32), 1)) \
        .astype(jnp.bfloat16)
    # wide transpose selector: contracts the (L, 128) raw row fetches
    # down to (32, L) in the same MXU pass (k == p < 32 only)
    sel32 = (jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)) \
        .astype(jnp.bfloat16)

    def table_lookup(idx):
        """one_tab[idx] elementwise for (R, L) int32 idx in [0, 255].

        The table is SHARED across lanes, so a 256-entry lookup is a
        lane-dimension dynamic_gather (tpu.dynamic_gather, dims=[1]:
        y[s,j] = x[s, idx[s,j]] — table entries sit in the LANE axis,
        data lanes index it) + one arithmetic select on the high index
        bit.  ~7 VPU ops per 128-lane chunk, vs ~100 for the round-2
        binary-select tree over a (256, 1) sublane table (kept as the
        FFV1_PALLAS_GATHER=0 fallback).

        Mosaic requires the gather operands to span >= 2 sublanes —
        a (1, 128) take_along_axis fails lowering with "Shape mismatch
        in input, indices and output" (the round-3/4 'gather broken'
        regression was exactly this; scripts/probes/gather_probe4.py).
        R == 1 lookups therefore ride a row-tiled ([lo, hi] x 4 ->
        (8, 128)) table so ONE legal 8-sublane gather yields both
        halves; R >= 2 broadcasts the lo/hi rows.  Lane counts past
        the 128-lane vreg width split into chunks (the gather operand
        must be exactly 128 lanes), which keeps the cheap lookup form
        available to large stream batches (batch >= 6 x 24 slices)."""
        R = idx.shape[0]
        i7 = idx & 127
        hib = (idx >> 7) & 1
        outs = []
        for c0 in range(0, L, 128):
            w = min(128, L - c0)
            ic = i7[:, c0:c0 + w]
            if w != 128:
                ic = jnp.concatenate(
                    [ic, jnp.zeros((R, 128 - w), jnp.int32)], axis=1)
            if R == 1:
                t18 = jnp.concatenate([t1_ref[...]] * 4, 0)  # (8, 128)
                g = jnp.take_along_axis(
                    t18, jnp.broadcast_to(ic, (8, 128)), axis=1)
                g_lo, g_hi = g[0:1, :w], g[1:2, :w]
            else:
                g_lo = jnp.take_along_axis(
                    jnp.broadcast_to(t1_ref[0:1, :], (R, 128)), ic,
                    axis=1)[:, :w]
                g_hi = jnp.take_along_axis(
                    jnp.broadcast_to(t1_ref[1:2, :], (R, 128)), ic,
                    axis=1)[:, :w]
            outs.append(g_lo + (g_hi - g_lo) * hib[:, c0:c0 + w])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 1)

    def lookup_one(idx):
        """one_tab[idx] for idx (1, L) int32 in [0, 255] -> (1, L)."""
        if gather:
            return table_lookup(idx)
        lo = t1_ref[pl.ds(0, 128), :]                  # (128, 1) int32
        hi = t1_ref[pl.ds(128, 128), :]
        c = lo + (hi - lo) * ((idx >> 7) & 1)          # (128, L)
        c = c[:64, :] + (c[64:, :] - c[:64, :]) * ((idx >> 6) & 1)
        c = c[:32, :] + (c[32:, :] - c[:32, :]) * ((idx >> 5) & 1)
        c = c[:16, :] + (c[16:, :] - c[:16, :]) * ((idx >> 4) & 1)
        c = c[:8, :] + (c[8:, :] - c[:8, :]) * ((idx >> 3) & 1)
        d = iota8 - (idx & 7)
        m = jnp.maximum(0, 1 - d * d)                  # (8, L) one-hot
        return jnp.sum(c * m, axis=0, keepdims=True)

    def transition(s, b):
        """bit ? one[s] : zero[s] via the single-table identity."""
        idx = jnp.where(b == 1, s, (256 - s) & 0xFF)
        t = lookup_one(idx)
        return jnp.where(b == 1, t, (256 - t) & 0xFF)

    def pixel(i, _):
        # coder state and the low/range chain run on (1, L) ROW vectors:
        # one (8, 128) tile per op, instead of (L, 1) columns spread over
        # L/8 mostly-empty sublane tiles (~12x VPU occupancy for L=96)
        low = lowv[pl.ds(0, 1), :]                             # (1, L)
        rng = rngv[pl.ds(0, 1), :]
        vR = diff_ref[pl.ds(i, 1), :]                          # (1, L)
        apxR = act_ref[pl.ds(i, 1), :]                         # (1, L)

        # State layout: one context row per sublane — row c lives at
        # [lane, c, 0:32] of the (L, CC, 128) scratch (c's tile is
        # c >> 3, sublane c & 7).  Dynamic slice bases stay 8-aligned
        # (Mosaic requirement); sublane selection is mask-based.  Costs
        # 4x the VMEM of a 4-rows-per-sublane packing but drops the
        # dynamic lane rotate + group masks from both per-lane loops
        # (measured 54% + 27% of round-2 kernel time).
        skip_read = _ablate == "no_loops"
        skip_write = _ablate in ("no_loops", "no_write")
        row_list = []
        blocks = []
        subs = []
        bases = []
        for lane in ([] if skip_read else range(L)):
            ci = ctx_ref[i, lane]
            if _ablate == "static_base":   # timing: static tile slice
                base = 0
            else:
                base = pl.multiple_of((ci >> 3) * 8, 8)
            bases.append(base)
            block = states[lane, pl.ds(base, 8), :]    # (8, 128) sdt
            sub = ci & 7
            if wide and gather:
                # sublane select via ONE dim-0 dynamic_gather — the
                # (8, 128) int32 shape is the one sublane-gather v5e
                # Mosaic compiles (probed); saves the masked reduce's
                # ~3 ops per lane per pixel
                rowfull = jnp.take_along_axis(
                    block, jnp.broadcast_to(sub, (8, 128)), axis=0)[0:1]
            else:
                rowfull = jnp.sum(jnp.where(iota8 == sub, block, 0),
                                  axis=0, keepdims=True)   # (1, 128)
            row_list.append(rowfull[:, :32])
            blocks.append(block)
            subs.append(sub)
        if skip_read:                  # timing floor: no per-lane loops
            rows8 = jnp.broadcast_to(
                states[0, pl.ds(0, 8), :][0:1, :32] +
                vR[0:1, 0:1].astype(sdt) * 0, (L, 32)).astype(sdt)
        else:
            rows8 = jnp.concatenate(row_list, 0)  # (L, 32) int8

        # all chain/transition math in (32, L) / (1, L) row orientation
        rowsT = jax.lax.dot_general(
            eye32, rows8.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) & 0xFF

        aR = jnp.abs(vR)
        eR = 31 - jax.lax.clz(jnp.maximum(aR, 1).astype(jnp.uint32)) \
            .astype(jnp.int32)
        nzR = vR != 0
        apxB = apxR != 0

        def chain_step(aj, s, b, low, rng):
            r1 = (rng * s) >> 8
            nr = jnp.where(b == 1, r1, rng - r1)
            nl = low + jnp.where(b == 1, rng - r1, 0)
            emit = aj & (nr < 0x100)
            pv = ((nl >> 8) |
                  jnp.where((nl & 0xFF) != 0, 1 << 16, 0)) + \
                emit.astype(jnp.int32) * (1 << 20)
            nl = jnp.where(emit, (nl & 0xFF) << 8, nl)
            nr = jnp.where(emit, nr << 8, nr)
            low = jnp.where(aj, nl, low)
            rng = jnp.where(aj, nr, rng)
            return pv, low, rng

        if bits <= 10:
            is_expT = (posT >= 1) & (posT <= 10)
            is_manT = posT >= 22
            actT = ((posT == 0) |
                    (is_expT & nzR & (posT - 1 <= eR)) |
                    (is_manT & nzR & (posT - 22 < eR))) & apxB
            bitT = jnp.where(
                posT == 0, (~nzR).astype(jnp.int32),
                jnp.where(is_expT, (posT - 1 < eR).astype(jnp.int32),
                          (aR >> jnp.clip(posT - 22, 0, 30)) & 1))

            # sign: exactly one of rows 11..11+e_max codes (v < 0), at
            # row 11+e (ffv1enc.c:217-228) — one dynamic step
            signsel = posT == (11 + eR)                  # (32, L)
            s_sign = jnp.sum(jnp.where(signsel, rowsT, 0), axis=0,
                             keepdims=True)              # (1, L)
            sign_bit = (vR < 0).astype(jnp.int32)
            sign_act = nzR & apxB

            # per-position transitions (independent of the low/range
            # chain: state indices touched within a pixel are pairwise
            # distinct)
            if gather:
                # ALL adapted rows in ONE batched (32, L) lookup: actT
                # is exact on every row (exp rows past e_max+1 and man
                # row 31 are provably inactive at bits <= 10, |v| <
                # 2^bits), and the sign rows 11..21 are disjoint from
                # the static order — so one act/bit/idx matrix covers
                # the whole table update.  Two (32, 128) dim-1 gathers
                # replace the ~18 per-slot select-trees that dominated
                # the tree-form kernel (~60% of per-pixel time on v5e).
                b32 = jnp.where(signsel,
                                jnp.broadcast_to(sign_bit, (32, L)), bitT)
                act32 = actT | (signsel & sign_act)
                idx32 = jnp.where(b32 == 1, rowsT, (256 - rowsT) & 0xFF)
                t32 = table_lookup(idx32)
                n32 = jnp.where(b32 == 1, t32, (256 - t32) & 0xFF)
                new_rowsT = jnp.where(act32, n32, rowsT)
            else:
                news = {p: transition(rowsT[p:p + 1, :], bitT[p:p + 1, :])
                        for p in order}
                new_sign = transition(s_sign, sign_bit)

                base = jnp.where(signsel & sign_act,
                                 jnp.broadcast_to(new_sign, (32, L)),
                                 rowsT)
                rows_new = []
                for p in range(32):
                    if p in news:
                        rows_new.append(
                            jnp.where(actT[p:p + 1, :], news[p],
                                      base[p:p + 1, :]))
                    else:
                        rows_new.append(base[p:p + 1, :])
                new_rowsT = jnp.concatenate(rows_new, 0)  # (32, L) int32

            if _ablate == "no_trans":
                new_rowsT = rowsT
            if _ablate == "no_chain":     # timing: skip low/range chain
                outs = [rowsT[k % 32:k % 32 + 1, :] + eR
                        for k in range(S)]
            else:
                outs = []
                for p in order:
                    pv, low, rng = chain_step(actT[p:p + 1, :],
                                              rowsT[p:p + 1, :],
                                              bitT[p:p + 1, :], low, rng)
                    outs.append(pv)
                pv, low, rng = chain_step(sign_act, s_sign, sign_bit,
                                          low, rng)
                outs.append(pv)
        else:
            # extended schedule (coded widths 11..17): put_symbol's
            # FFMIN row caps give rows 10 and 31 SEVERAL decisions per
            # pixel (ffv1enc.c:185-231) — those two rows carry RUNNING
            # states transitioned sequentially through the slot walk;
            # everything else keeps the one-shot batch adaptation.
            # ``order`` is rc_scan_fast.ext_slots(bits); semantics
            # mirror rc_scan_lanes.rc_encode_scan_lanes_ext exactly.
            signsel = posT == (11 + jnp.minimum(eR, 10))
            s_sign = jnp.sum(jnp.where(signsel, rowsT, 0), axis=0,
                             keepdims=True)
            sign_bit = (vR < 0).astype(jnp.int32)
            sign_act = nzR & apxB
            s10 = rowsT[10:11, :]
            s31 = rowsT[31:32, :]
            news = {}
            new_sign = s_sign
            outs = []
            for sl in order:
                kind = sl[0]
                if kind == "zero":
                    act = apxB
                    bit = (~nzR).astype(jnp.int32)
                    s = rowsT[0:1, :]
                elif kind == "exp":
                    j = sl[1]
                    act = apxB & nzR & (j <= eR)
                    bit = (j < eR).astype(jnp.int32)
                    s = rowsT[1 + j:2 + j, :] if j <= 8 else s10
                elif kind == "man31":
                    r = sl[1]
                    act = apxB & nzR & (eR >= 10 + r)
                    bit = (aR >> jnp.clip(eR - 1 - r, 0, 30)) & 1
                    s = s31
                elif kind == "man":
                    mi = sl[1]
                    act = apxB & nzR & (mi < eR)
                    bit = (aR >> mi) & 1
                    s = rowsT[22 + mi:23 + mi, :]
                else:  # sign
                    act = sign_act
                    bit = sign_bit
                    s = s_sign
                pv, low, rng = chain_step(act, s, bit, low, rng)
                outs.append(pv)
                ns = transition(s, bit)
                if kind == "exp" and sl[1] >= 9:
                    s10 = jnp.where(act, ns, s10)
                elif kind == "man31":
                    s31 = jnp.where(act, ns, s31)
                elif kind == "sign":
                    new_sign = jnp.where(act, ns, s_sign)
                elif kind == "exp":
                    news[1 + sl[1]] = (act, ns)
                elif kind == "man":
                    news[22 + sl[1]] = (act, ns)
                else:
                    news[0] = (act, ns)

            base = jnp.where(signsel & sign_act,
                             jnp.broadcast_to(new_sign, (32, L)), rowsT)
            rows_new = []
            for p in range(32):
                if p == 10:
                    rows_new.append(s10)
                elif p == 31:
                    rows_new.append(s31)
                elif p in news:
                    act, ns = news[p]
                    rows_new.append(jnp.where(act, ns, base[p:p + 1, :]))
                else:
                    rows_new.append(base[p:p + 1, :])
            new_rowsT = jnp.concatenate(rows_new, 0)     # (32, L) int32

        # transpose back to (L, 32) for the per-lane write loop
        new_rows8 = jax.lax.dot_general(
            new_rowsT.astype(jnp.bfloat16), eye32,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) & 0xFF
        new_rows8 = new_rows8.astype(sdt)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lane_lt32 = lane128 < 32                         # static mask
        if L % 8:
            new_rows8 = jnp.concatenate(
                [new_rows8, jnp.zeros((8 - L % 8, 32), sdt)], axis=0)
        # lane-replicate ONCE (1 op) — the per-lane loop then extracts
        # an already-replicated (1, 128) row; wmask's lane_lt32 restricts
        # the merge to the real 32 slots, so replication garbage beyond
        # lane 32 never lands.  (The previous per-lane 4x concat was
        # ~1/3 of the write loop, itself 53% of kernel time.)
        new_rows128 = jnp.concatenate([new_rows8] * 4, axis=1)  # (L', 128)
        for lane in ([] if skip_write else range(L)):
            base_r = bases[lane]   # reuse the read loop's scalar fetch
            # lane's row: STATIC single-sublane slice (measured fine on
            # v5e Mosaic — only DYNAMIC non-8-aligned slices are
            # rejected), merged into the block under the sublane mask
            nr128 = new_rows128[lane:lane + 1, :]        # (1, 128) int8
            wmask = (iota8 == subs[lane]) & lane_lt32    # (8, 128)
            nb = jnp.where(wmask, nr128, blocks[lane])
            states[lane, pl.ds(base_r, 8), :] = nb

        if compact:
            # per-pixel slot compaction in-kernel: >99.99% of pixels
            # emit <= 4 bytes (measured max 3 on full-range noise), so
            # pack [slot0..3, count, overflow, 0, 0] into an 8-row
            # output — 3x less HBM traffic than the (S, L) raw form and
            # no downstream per-pixel compaction pass.  Overflow (> 4
            # emissions) is flagged; the caller redoes the frame on the
            # XLA scan path.
            allv = jnp.concatenate(outs, 0)            # (S, L)
            val = (allv >> 20) & 1
            # exclusive running count via a strict-lower-triangular MXU
            # contraction (cumsum has no Pallas-TPU lowering); counts
            # <= S are bf16-exact
            r_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            c_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            tri = (c_i < r_i).astype(jnp.bfloat16)
            cnt_exc = jax.lax.dot(
                tri, val.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            pv17 = allv & 0x1FFFF
            srows = [jnp.sum(pv17 * val * (cnt_exc == k), axis=0,
                             keepdims=True) for k in range(4)]
            total = jnp.sum(val, axis=0, keepdims=True)  # (1, L)
            ovf = (total > 4).astype(jnp.int32)
            zero = jnp.zeros_like(total)
            prov_ref[i, :, :] = jnp.concatenate(
                srows + [total, ovf, zero, zero], 0)   # (8, L)
        else:
            # NOTE: per-slot row stores (prov_ref[i, k, :] = pv)
            # measured SLOWER (+14 ms/step) than this concat + block
            # store — Mosaic's dynamic-leading-index row store is not
            # cheap; keep the temp
            prov_ref[i, :, :] = jnp.concatenate(outs, 0)   # (S, L)
        lowv[pl.ds(0, 1), :] = low
        rngv[pl.ds(0, 1), :] = rng
        return 0

    # FFV1_PALLAS_UNROLL replicates the pixel body per loop iteration to
    # amortize Mosaic's loop control; the body is serial either way (the
    # adaptive coder chains pixel to pixel), so this is pure
    # instruction-overhead ablation (default 1 = no unroll)
    import os as _os2
    _unroll = int(_os2.environ.get("FFV1_PALLAS_UNROLL", "1"))
    if _unroll > 1 and CH % _unroll == 0:
        def pixels(j, c):
            for u in range(_unroll):
                pixel(j * _unroll + u, c)
            return 0
        jax.lax.fori_loop(0, CH // _unroll, pixels, 0)
    else:
        jax.lax.fori_loop(0, CH, pixel, 0)

    @pl.when(step == nsteps - 1)
    def _fin():
        lowout_ref[...] = lowv[...]
        rngout_ref[...] = rngv[...]
        for k in range(L // SCH):
            stage[...] = states[pl.ds(k * SCH, SCH)].astype(jnp.int8)
            dma = pltpu.make_async_copy(
                stage, statesout_ref.at[pl.ds(k * SCH, SCH)], dsem)
            dma.start()
            dma.wait()


def _pallas_scan(ctx, diff, active, states0, one_tab, zero_tab,
                 low0, range0, bits: int, chunk: int, compact: bool,
                 gather=None):
    L, N = ctx.shape
    CC_real = states0.shape[1]
    NB = -(-CC_real // 8)                # 8 context rows per (8,128) tile
    CC = NB * 8                          # scratch sublane count
    if bits <= 10:
        order = chain_order_nosign(bits)
        S = len(order) + 1               # + the collapsed sign slot
    else:
        # extended schedule: ``order`` becomes the ext slot list (sign
        # included); the in-kernel per-pixel compaction is fast-path
        # only
        from .rc_scan_fast import ext_slots
        order = tuple(ext_slots(bits))
        S = len(order)
        assert not compact
    SOUT = 8 if compact else S
    assert N % chunk == 0
    nsteps = N // chunk

    # single-table transitions: zero_tab is derived from one_tab by the
    # normative identity (see module docstring); zero_tab stays in the
    # signature for API compatibility with the XLA kernels
    del zero_tab
    import os as _os
    # the lane-axis dynamic_gather lookups address a (2, 128) row
    # table; lane counts past 128 split into 128-lane gather chunks
    # (see _kernel.table_lookup).  ``gather=None`` takes the env
    # default; callers pass False on the staged retry after a Mosaic
    # lowering failure of the gather form, keeping the kernel tier
    # alive via the (byte-identical) binary-select tree form
    if gather is None:
        gather = (_os.environ.get("FFV1_PALLAS_GATHER", "1")
                  not in ("0", "false"))
    # (2, 128) row form: entries 0..127 / 128..255 in the LANE axis for
    # the dynamic_gather lookup (see _kernel.lookup_one); the tree
    # fallback wants the (256, 1) sublane column form
    t1_tab = one_tab.astype(jnp.int32).reshape(2, 128) if gather \
        else one_tab.astype(jnp.int32)[:, None]

    # int32 state scratch ("wide"): an (8, 128) int32 block is exactly
    # one VREG, so the per-lane dynamic row slices in the read/write
    # loops avoid the int8 quarter-tile repack Mosaic inserts around
    # sub-vreg slices.  4x the VMEM (fits comfortably to ~160 lanes
    # under the 100 MB budget); gated for A/B measurement.
    wide = _os.environ.get("FFV1_PALLAS_WIDE", "1") not in ("0", "false")
    SCH = next(c for c in (8, 4, 2, 1) if L % c == 0)
    kernel = functools.partial(_kernel, bits, L, CC, chunk, S, order,
                               compact, wide, gather)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((chunk, L), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),      # ctx
            pl.BlockSpec((chunk, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # diff
            pl.BlockSpec((chunk, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # act
            pl.BlockSpec(memory_space=pltpu.VMEM),      # t1
            pl.BlockSpec(memory_space=_ANY),       # states0 (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # low0
            pl.BlockSpec(memory_space=pltpu.VMEM),      # range0
        ],
        out_specs=[
            pl.BlockSpec((chunk, SOUT, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # prov (packed)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # low out
            pl.BlockSpec(memory_space=pltpu.VMEM),      # range out
            pl.BlockSpec(memory_space=_ANY),       # states out (HBM)
        ],
        scratch_shapes=[
            pltpu.VMEM((L, CC, 128),
                       jnp.int32 if wide else jnp.int8),  # states
            pltpu.VMEM((1, L), jnp.int32),              # low
            pltpu.VMEM((1, L), jnp.int32),              # range
            pltpu.VMEM((SCH, CC, 128), jnp.int8),       # DMA staging
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # pack rows: row c -> [sublane c of (L, CC, 128), lanes 0:32]
    states0_pad = jnp.pad(states0.astype(jnp.int8),
                          ((0, 0), (0, CC - CC_real), (0, 96)))
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # default scoped-vmem budget is 16 MB; v5e has 128 MB.  Large
        # lane counts (stream batch >= 8: states scratch alone is
        # L*CC*128 int8 ~ 8 MB) need more headroom; the wide (int32)
        # scratch at 120+ lanes needs nearly all of it
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=116 << 20),
        out_shape=[
            jax.ShapeDtypeStruct((N, SOUT, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((L, CC, 128), jnp.int8),
        ],
    )(ctx.T.astype(jnp.int32), diff.T.astype(jnp.int32),
      active.T.astype(jnp.int32), t1_tab, states0_pad,
      low0[None, :].astype(jnp.int32), range0[None, :].astype(jnp.int32))
    prov, low, rng, states_out = res

    states_u8 = states_out[:, :CC_real, :32].astype(jnp.uint8)
    return prov, low[0], rng[0], states_u8


@functools.partial(jax.jit, static_argnames=("bits", "chunk", "gather"))
def rc_encode_pallas_packed(ctx, diff, active, states0, one_tab, zero_tab,
                            low0, range0, bits: int, chunk: int = 512,
                            gather=None):
    """Pallas lane-major range-coder scan, raw output form.

    Returns (packed int32[N, S, L], low[L], range[L], states uint8)
    with the emit flag in bit 20 and the provisional value in bits
    0..16.  states0 must be uint8 (L, CC, 32).
    """
    return _pallas_scan(ctx, diff, active, states0, one_tab, zero_tab,
                        low0, range0, bits, chunk, False, gather)


@functools.partial(jax.jit, static_argnames=("bits", "chunk", "gather"))
def rc_encode_pallas_compact(ctx, diff, active, states0, one_tab,
                             zero_tab, low0, range0, bits: int,
                             chunk: int = 512, gather=None):
    """Pallas scan with in-kernel per-pixel slot compaction.

    Returns (cm int32[N, 8, L], low[L], range[L], states uint8) where
    cm rows are [slot0..slot3 (prov_value format), count, overflow,
    0, 0].  3x less HBM traffic than the raw (N, S, L) form; on
    overflow (a pixel emitted > 4 bytes — unobserved even on
    full-range noise) the caller redoes the frame on the XLA path.
    """
    return _pallas_scan(ctx, diff, active, states0, one_tab, zero_tab,
                        low0, range0, bits, chunk, True, gather)


@functools.partial(jax.jit, static_argnames=("bits", "chunk"))
def rc_encode_pallas(ctx, diff, active, states0, one_tab, zero_tab,
                     low0, range0, bits: int, chunk: int = 512):
    """rc_encode_scan_lanes-compatible wrapper: prov/valid unpacked to
    (N, L, S).  Prefer rc_encode_pallas_packed + finalize_packed in
    the production pipeline."""
    prov, low, rng, states_u8 = rc_encode_pallas_packed(
        ctx, diff, active, states0, one_tab, zero_tab, low0, range0,
        bits, chunk)
    valid = (prov >> 20) & 1
    prov_out = jnp.moveaxis(prov & 0x1FFFF, 2, 1)       # (N, L, S)
    valid_out = jnp.moveaxis(valid, 2, 1).astype(bool)
    return prov_out, valid_out, low, rng, states_u8
