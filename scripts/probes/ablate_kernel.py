"""Ablation timing of the production Pallas scan kernel: compile
variants with individual stages stubbed out and time each on hardware.

Variants (cumulative semantics broken on purpose; timing only):
  full        — the real pixel body
  no_read     — rows8 = constant (skips per-lane read loop)
  no_trans    — new_rows8 = rows8 (skips onehot256 + 2 matvecs)
  no_write    — skips per-lane write loop
  no_chain    — skips the 24-position low/range chain + emissions
  loops_only  — read+write loops only
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

from tpu_ffv1.tpu.rc_scan_fast import chain_order
from tpu_ffv1.core.rac import default_state_tables

L, NB, NPIX = 96, 42, 129600
CHUNK = 144
CC = NB * 8
bits = 8
order = chain_order(bits)
S = len(order)


def kernel(read, trans, write, chain,
           ctx_ref, diff_ref, act_ref, t0_ref, t1_ref,
           prov_ref, states, lowv, rngv):
    pos32 = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    posT = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    eye32 = (jax.lax.broadcasted_iota(jnp.int32, (32, 32), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (32, 32), 1)) \
        .astype(jnp.bfloat16)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def pixel(i, _):
        low = lowv[pl.ds(0, 1), :]
        rng = rngv[pl.ds(0, 1), :]
        vR = diff_ref[pl.ds(i, 1), :]
        apxR = act_ref[pl.ds(i, 1), :]
        v = jnp.transpose(vR)

        blocks, subs, groups = [], [], []
        if read:
            row_list = []
            for lane in range(L):
                ci = ctx_ref[i, lane]
                base = pl.multiple_of((ci >> 5) * 8, 8)
                block = states[lane, pl.ds(base, 8), :]
                sub = (ci >> 2) & 7
                group = ci & 3
                rowfull = jnp.sum(jnp.where(iota8 == sub, block, 0),
                                  axis=0, keepdims=True)
                rolled = pltpu.roll(rowfull, -group * 32, 1)
                row_list.append(rolled[:, :32])
                blocks.append(block)
                subs.append(sub)
                groups.append(group)
            rows8 = jnp.concatenate(row_list, 0)
        else:
            rows8 = jnp.broadcast_to(
                (jax.lax.broadcasted_iota(jnp.int32, (L, 32), 1) + 1)
                .astype(jnp.int8), (L, 32))
            for lane in range(L):
                ci = ctx_ref[i, lane]
                blocks.append(None)
                subs.append((ci >> 2) & 7)
                groups.append(ci & 3)

        a = jnp.abs(v)
        e = 31 - jax.lax.clz(jnp.maximum(a, 1).astype(jnp.uint32)) \
            .astype(jnp.int32)
        vL, aL, eL = v, a, e
        nzL = vL != 0
        apxL = jnp.transpose(apxR) != 0
        is_exp = (pos32 >= 1) & (pos32 <= 10)
        is_man = pos32 >= 22
        act32 = ((pos32 == 0) |
                 (is_exp & nzL & (pos32 - 1 <= eL)) |
                 ((pos32 >= 11) & (pos32 <= 21) & nzL &
                  (pos32 == 11 + eL)) |
                 (is_man & nzL & (pos32 - 22 < eL))) & apxL
        bit32 = jnp.where(
            pos32 == 0, (~nzL).astype(jnp.int32),
            jnp.where(is_exp, (pos32 - 1 < eL).astype(jnp.int32),
                      jnp.where(is_man,
                                (aL >> jnp.clip(pos32 - 22, 0, 30)) & 1,
                                (vL < 0).astype(jnp.int32))))

        if trans:
            onehot = (rows8[..., None] == iota256.astype(jnp.int8)
                      .reshape(1, 1, 256)).astype(jnp.int8) \
                .reshape(L * 32, 256)
            t0 = jax.lax.dot_general(
                onehot, t0_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(L, 32)
            t1 = jax.lax.dot_general(
                onehot, t1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(L, 32)
            new_rows8 = jnp.where(act32,
                                  jnp.where(bit32 == 1, t1, t0)
                                  .astype(jnp.int8),
                                  rows8)
        else:
            new_rows8 = rows8 + jnp.int8(1)

        if write:
            nr8 = new_rows8
            for lane in range(L):
                ci = ctx_ref[i, lane]
                base = pl.multiple_of((ci >> 5) * 8, 8)
                b8 = (lane // 8) * 8
                nr = jnp.sum(jnp.where(iota8 == (lane % 8),
                                       nr8[b8:b8 + 8, :], 0),
                             axis=0, keepdims=True)
                nr128 = jnp.concatenate([nr, nr, nr, nr], axis=1)
                if blocks[lane] is None:
                    nb = nr128
                else:
                    wmask = (iota8 == subs[lane]) & \
                        ((lane128 >> 5) == groups[lane])
                    nb = jnp.where(wmask, nr128, blocks[lane])
                states[lane, pl.ds(pl.multiple_of(
                    (ctx_ref[i, lane] >> 5) * 8, 8), 8), :] = nb

        if chain:
            aR = jnp.transpose(a)
            eR = jnp.transpose(e)
            nzR = vR != 0
            is_expT = (posT >= 1) & (posT <= 10)
            is_manT = posT >= 22
            actT = ((posT == 0) |
                    (is_expT & nzR & (posT - 1 <= eR)) |
                    ((posT >= 11) & (posT <= 21) & nzR &
                     (posT == 11 + eR)) |
                    (is_manT & nzR & (posT - 22 < eR))) & (apxR != 0)
            bitT = jnp.where(
                posT == 0, (~nzR).astype(jnp.int32),
                jnp.where(is_expT, (posT - 1 < eR).astype(jnp.int32),
                          jnp.where(is_manT,
                                    (aR >> jnp.clip(posT - 22, 0, 30)) & 1,
                                    (vR < 0).astype(jnp.int32))))
            rowsT = jax.lax.dot_general(
                eye32, rows8.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32) & 0xFF
            outs = []
            for p in order:
                aj = actT[p:p + 1, :]
                s = rowsT[p:p + 1, :]
                b = bitT[p:p + 1, :]
                r1 = (rng * s) >> 8
                nr = jnp.where(b == 1, r1, rng - r1)
                nl = low + jnp.where(b == 1, rng - r1, 0)
                emit = aj & (nr < 0x100)
                pv = ((nl >> 8) |
                      jnp.where((nl & 0xFF) != 0, 1 << 16, 0)) + \
                    emit.astype(jnp.int32) * (1 << 20)
                outs.append(pv)
                nl = jnp.where(emit, (nl & 0xFF) << 8, nl)
                nr = jnp.where(emit, nr << 8, nr)
                low = jnp.where(aj, nl, low)
                rng = jnp.where(aj, nr, rng)
            prov_ref[i, :, :] = jnp.concatenate(outs, 0)
            lowv[pl.ds(0, 1), :] = low
            rngv[pl.ds(0, 1), :] = rng
        else:
            lowv[pl.ds(0, 1), :] = low + jnp.sum(
                new_rows8.astype(jnp.int32), axis=1, keepdims=True) \
                .T[0:1, :]
        return 0

    jax.lax.fori_loop(0, CHUNK, pixel, 0)


one_tab, zero_tab = default_state_tables()
rng_ = np.random.default_rng(0)
ctx = rng_.integers(0, 165 * 4, (NPIX, L)).astype(np.int32)
diff = rng_.integers(-20, 21, (NPIX, L)).astype(np.int32)
act = np.ones((NPIX, L), np.int32)
t0t = np.asarray(zero_tab, np.int8)[:, None]
t1t = np.asarray(one_tab, np.int8)[:, None]

VARIANTS = [
    ("full", dict(read=1, trans=1, write=1, chain=1)),
    ("no_read", dict(read=0, trans=1, write=1, chain=1)),
    ("no_trans", dict(read=1, trans=0, write=1, chain=1)),
    ("no_write", dict(read=1, trans=1, write=0, chain=1)),
    ("no_chain", dict(read=1, trans=1, write=1, chain=0)),
    ("loops_only", dict(read=1, trans=0, write=1, chain=0)),
]

for name, flags in VARIANTS:
    k = functools.partial(kernel, flags["read"], flags["trans"],
                          flags["write"], flags["chain"])
    f = pl.pallas_call(
        k,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NPIX // CHUNK,),
            in_specs=[pl.BlockSpec((CHUNK, L), lambda i: (i, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((CHUNK, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((CHUNK, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK, S, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((L, CC, 128), jnp.int8),
                            pltpu.VMEM((1, L), jnp.int32),
                            pltpu.VMEM((1, L), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((NPIX, S, L), jnp.int32),
    )
    fj = jax.jit(f)
    try:
        np.asarray(fj(ctx, diff, act, t0t, t1t)[0, 0, 0])
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(fj(ctx, diff, act, t0t, t1t)[0, 0, 0])
            ts.append(time.time() - t0)
        print(f"{name:11s}: {min(ts)/NPIX*1e9:7.0f} ns/pixel", flush=True)
    except Exception as e:
        print(f"{name:11s}: FAILED {type(e).__name__}: "
              f"{str(e).split(chr(10))[0][:200]}", flush=True)
