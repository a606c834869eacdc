"""Round-3 ablation of the PRODUCTION Pallas kernels at production
shape on real HW.  Each variant stubs one stage (semantics broken on
purpose; timing only).

Usage: python scripts/ablate3.py enc|dec [variants...]
Variants (encode): full noread nowrite noperlane notrans nochain
Variants (decode): full noread nowrite noperlane notrans feedless

Also times the non-kernel parts of the encode pipeline: stencil-only
and finalize-only jits.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ffv1.core.rac import default_state_tables
from tpu_ffv1.tpu.rc_scan_fast import chain_order_nosign

L, CCr, NPIX = 96, 1332, 129600
bits = 8
CHUNK = 48


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


# ---------------- encode kernel (copy of rc_pallas._kernel w/ flags) ---


def _ekernel(flags, order, S, ctx_ref, diff_ref, act_ref, t1_ref,
             states0_ref, low0_ref, rng0_ref,
             prov_ref, lowout_ref, rngout_ref, statesout_ref,
             states, lowv, rngv):
    read, write, trans, chain = (flags["read"], flags["write"],
                                 flags["trans"], flags["chain"])
    step = pl.program_id(0)
    NB8 = states.shape[1]

    @pl.when(step == 0)
    def _init():
        states[...] = states0_ref[...]
        lowv[...] = low0_ref[...]
        rngv[...] = rng0_ref[...]

    posT = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    eye32 = (jax.lax.broadcasted_iota(jnp.int32, (32, 32), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (32, 32), 1)) \
        .astype(jnp.bfloat16)

    def lookup_one(idx):
        lo = t1_ref[pl.ds(0, 128), :]
        hi = t1_ref[pl.ds(128, 128), :]
        c = lo + (hi - lo) * ((idx >> 7) & 1)
        c = c[:64, :] + (c[64:, :] - c[:64, :]) * ((idx >> 6) & 1)
        c = c[:32, :] + (c[32:, :] - c[:32, :]) * ((idx >> 5) & 1)
        c = c[:16, :] + (c[16:, :] - c[:16, :]) * ((idx >> 4) & 1)
        c = c[:8, :] + (c[8:, :] - c[:8, :]) * ((idx >> 3) & 1)
        d = iota8 - (idx & 7)
        m = jnp.maximum(0, 1 - d * d)
        return jnp.sum(c * m, axis=0, keepdims=True)

    def transition(s, b):
        if not trans:
            return s
        idx = jnp.where(b == 1, s, (256 - s) & 0xFF)
        t = lookup_one(idx)
        return jnp.where(b == 1, t, (256 - t) & 0xFF)

    def pixel(i, _):
        low = lowv[pl.ds(0, 1), :]
        rng = rngv[pl.ds(0, 1), :]
        vR = diff_ref[pl.ds(i, 1), :]
        apxR = act_ref[pl.ds(i, 1), :]

        row_list = []
        blocks = []
        subs = []
        bases = []
        if read:
            for lane in range(L):
                ci = ctx_ref[i, lane]
                base = pl.multiple_of((ci >> 3) * 8, 8)
                bases.append(base)
                block = states[lane, pl.ds(base, 8), :]
                sub = ci & 7
                rowfull = jnp.sum(jnp.where(iota8 == sub, block, 0),
                                  axis=0, keepdims=True)
                row_list.append(rowfull[:, :32])
                blocks.append(block)
                subs.append(sub)
            rows8 = jnp.concatenate(row_list, 0)
        else:
            for lane in range(L):
                ci = ctx_ref[i, lane]
                bases.append(pl.multiple_of((ci >> 3) * 8, 8))
                subs.append(ci & 7)
                blocks.append(jnp.zeros((8, 128), jnp.int8))
            rows8 = jnp.broadcast_to(
                jnp.full((L, 32), 100, jnp.int8), (L, 32))

        rowsT = jax.lax.dot_general(
            eye32, rows8.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) & 0xFF

        aR = jnp.abs(vR)
        eR = 31 - jax.lax.clz(jnp.maximum(aR, 1).astype(jnp.uint32)) \
            .astype(jnp.int32)
        nzR = vR != 0
        apxB = apxR != 0
        is_expT = (posT >= 1) & (posT <= 10)
        is_manT = posT >= 22
        actT = ((posT == 0) |
                (is_expT & nzR & (posT - 1 <= eR)) |
                (is_manT & nzR & (posT - 22 < eR))) & apxB
        bitT = jnp.where(
            posT == 0, (~nzR).astype(jnp.int32),
            jnp.where(is_expT, (posT - 1 < eR).astype(jnp.int32),
                      (aR >> jnp.clip(posT - 22, 0, 30)) & 1))
        signsel = posT == (11 + eR)
        s_sign = jnp.sum(jnp.where(signsel, rowsT, 0), axis=0,
                         keepdims=True)
        sign_bit = (vR < 0).astype(jnp.int32)
        sign_act = nzR & apxB

        news = {p: transition(rowsT[p:p + 1, :], bitT[p:p + 1, :])
                for p in order}
        new_sign = transition(s_sign, sign_bit)
        base_r = jnp.where(signsel & sign_act,
                           jnp.broadcast_to(new_sign, (32, L)), rowsT)
        rows_new = []
        for p in range(32):
            if p in news:
                rows_new.append(jnp.where(actT[p:p + 1, :], news[p],
                                          base_r[p:p + 1, :]))
            else:
                rows_new.append(base_r[p:p + 1, :])
        new_rowsT = jnp.concatenate(rows_new, 0)
        new_rows8 = jax.lax.dot_general(
            new_rowsT.astype(jnp.bfloat16), eye32,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) & 0xFF
        new_rows8 = new_rows8.astype(jnp.int8)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lane_lt32 = lane128 < 32
        if write == 1:
            for lane in range(L):
                b8 = (lane // 8) * 8
                nr = jnp.sum(jnp.where(iota8 == (lane % 8),
                                       new_rows8[b8:b8 + 8, :], 0),
                             axis=0, keepdims=True)
                nr128 = jnp.concatenate([nr, nr, nr, nr], axis=1)
                wmask = (iota8 == subs[lane]) & lane_lt32
                nb = jnp.where(wmask, nr128, blocks[lane])
                states[lane, pl.ds(bases[lane], 8), :] = nb
        elif write == 2:   # hoisted 4x replication
            new_rows128 = jnp.concatenate([new_rows8] * 4, axis=1)
            for lane in range(L):
                b8 = (lane // 8) * 8
                nr128 = jnp.sum(jnp.where(iota8 == (lane % 8),
                                          new_rows128[b8:b8 + 8, :], 0),
                                axis=0, keepdims=True)
                wmask = (iota8 == subs[lane]) & lane_lt32
                nb = jnp.where(wmask, nr128, blocks[lane])
                states[lane, pl.ds(bases[lane], 8), :] = nb
        elif write == 3:   # static single-sublane row slice
            new_rows128 = jnp.concatenate([new_rows8] * 4, axis=1)
            for lane in range(L):
                nr128 = new_rows128[lane:lane + 1, :]
                wmask = (iota8 == subs[lane]) & lane_lt32
                nb = jnp.where(wmask, nr128, blocks[lane])
                states[lane, pl.ds(bases[lane], 8), :] = nb

        outs = []

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

        if chain:
            for p in order:
                pv, low, rng = chain_step(actT[p:p + 1, :],
                                          rowsT[p:p + 1, :],
                                          bitT[p:p + 1, :], low, rng)
                outs.append(pv)
            pv, low, rng = chain_step(sign_act, s_sign, sign_bit, low, rng)
            outs.append(pv)
            prov_ref[i, :, :] = jnp.concatenate(outs, 0)
        else:
            prov_ref[i, :, :] = jnp.broadcast_to(
                rowsT[0:1] + bitT[0:1], (S, L)).astype(jnp.int32)
        lowv[pl.ds(0, 1), :] = low
        rngv[pl.ds(0, 1), :] = rng
        return 0

    jax.lax.fori_loop(0, CHUNK, pixel, 0)

    nsteps = pl.num_programs(0)

    @pl.when(step == nsteps - 1)
    def _fin():
        lowout_ref[...] = lowv[...]
        rngout_ref[...] = rngv[...]
        statesout_ref[...] = states[...]


def run_enc_variant(name, flags):
    order = chain_order_nosign(bits)
    S = len(order) + 1
    NB = -(-CCr // 8)
    CC = NB * 8
    N = NPIX
    nsteps = N // CHUNK
    one_tab, _ = default_state_tables()
    t1 = jnp.asarray(one_tab.astype(np.int32)[:, None])
    rng0 = np.random.default_rng(0)
    ctx = jnp.asarray(rng0.integers(0, CCr, (N, L)).astype(np.int32))
    diff = jnp.asarray(rng0.integers(-12, 12, (N, L)).astype(np.int32))
    act = jnp.asarray(np.ones((N, L), np.int32))
    states0 = jnp.asarray(
        np.full((L, CC, 128), 128, np.int8))
    low0 = jnp.zeros((1, L), jnp.int32)
    range0 = jnp.full((1, L), 0xFF00, jnp.int32)

    kernel = functools.partial(_ekernel, flags, order, S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CHUNK, L), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, S, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, CC, 128), jnp.int8),
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
        ],
    )
    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        out_shape=[
            jax.ShapeDtypeStruct((N, S, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((L, CC, 128), jnp.int8),
        ])(*a))
    t0 = time.time()
    res = fn(ctx, diff, act, t1, states0, low0, range0)
    np.asarray(res[1])
    log(f"enc {name}: compile+run {time.time()-t0:.1f}s")
    for rep in range(3):
        t0 = time.time()
        res = fn(ctx, diff, act, t1, states0, low0, range0)
        np.asarray(res[1])
        log(f"enc {name} rep{rep}: {(time.time()-t0)*1000:.0f} ms")


ENC_VARIANTS = {
    "full": dict(read=1, write=1, trans=1, chain=1),
    "w2": dict(read=1, write=2, trans=1, chain=1),
    "w3": dict(read=1, write=3, trans=1, chain=1),
    "noread": dict(read=0, write=1, trans=1, chain=1),
    "nowrite": dict(read=1, write=0, trans=1, chain=1),
    "noperlane": dict(read=0, write=0, trans=1, chain=1),
    "notrans": dict(read=1, write=1, trans=0, chain=1),
    "nochain": dict(read=1, write=1, trans=1, chain=0),
    "loopsonly": dict(read=1, write=1, trans=0, chain=0),
}


def run_pipe():
    """Time the non-kernel encode pipeline parts at production shape:
    stencil (uniform streams) alone and finalize_packed alone."""
    from tpu_ffv1.codec.params import EncoderParams
    from tpu_ffv1.tpu.encoder import TPUFFV1Encoder
    from tpu_ffv1.tpu.rc_scan_lanes import finalize_packed

    enc = TPUFFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24), batch=4)
    rng0 = np.random.default_rng(0)
    planes = tuple(jnp.asarray(rng0.integers(
        0, 256, (4, h, w)).astype(np.uint8))
        for (h, w) in ((1080, 1920), (540, 960), (540, 960)))
    stencil = jax.jit(lambda s: enc._streams_uniform(s))
    t0 = time.time()
    r = stencil(planes)
    jax.block_until_ready(r)
    log(f"pipe stencil compile+run {time.time()-t0:.1f}s")
    for rep in range(3):
        t0 = time.time()
        r = stencil(planes)
        jax.block_until_ready(r)
        log(f"pipe stencil rep{rep}: {(time.time()-t0)*1000:.0f} ms")

    order = chain_order_nosign(bits)
    S = len(order) + 1
    N = enc.n_max
    packed = jnp.asarray(
        ((rng0.random((N, S, L)) < 0.08).astype(np.int32) << 20) |
        rng0.integers(0, 1 << 17, (N, S, L)).astype(np.int32), jnp.int32)
    low = jnp.zeros(L, jnp.int32)
    rngv = jnp.full(L, 0xFF00, jnp.int32)
    prefix = jnp.zeros((L, 96), jnp.int32)
    plen = jnp.full(L, 8, jnp.int32)
    fin = jax.jit(lambda p: finalize_packed(p, low, rngv, prefix, plen))
    t0 = time.time()
    r = fin(packed)
    jax.block_until_ready(r)
    log(f"pipe finalize compile+run {time.time()-t0:.1f}s")
    for rep in range(3):
        t0 = time.time()
        r = fin(packed)
        jax.block_until_ready(r)
        log(f"pipe finalize rep{rep}: {(time.time()-t0)*1000:.0f} ms")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "enc"
    names = sys.argv[2:] or list(ENC_VARIANTS)
    log(f"devices: {jax.devices()}")
    if mode == "enc":
        for n in names:
            run_enc_variant(n, ENC_VARIANTS[n])
    elif mode == "pipe":
        run_pipe()


if __name__ == "__main__":
    main()
