"""Ablate the REAL production kernel by source-patching rc_pallas.py
variants (semantics intentionally broken; timing only) and timing with
forced transfers (axon block_until_ready does not block).
"""
import importlib.util
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

SRC = open("tpu_ffv1/tpu/rc_pallas.py").read()

READ_LOOP = """        for lane in range(L):
            ci = ctx_ref[i, lane]
            base = pl.multiple_of((ci >> 5) * 8, 8)
            block = states[lane, pl.ds(base, 8), :]       # (8, 128) int8
            sub = (ci >> 2) & 7
            group = ci & 3
            rowfull = jnp.sum(jnp.where(iota8 == sub, block, 0), axis=0,
                              keepdims=True)       # (1, 128) int8
            # rotate the selected 32-lane group to the front (dynamic
            # lane rotate; lane reshapes/offset slices are unsupported)
            rolled = pltpu.roll(rowfull, -group * 32, 1)
            row_list.append(rolled[:, :32])
            blocks.append(block)
            subs.append(sub)
            groups.append(group)
        rows8 = jnp.concatenate(row_list, 0)      # (L, 32) int8 (wrapped)"""

READ_STUB = """        for lane in range(L):
            ci = ctx_ref[i, lane]
            blocks.append(None)
            subs.append((ci >> 2) & 7)
            groups.append(ci & 3)
        rows8 = jnp.broadcast_to(jnp.int8(127), (L, 32))"""

TRANS_BLOCK = """        news = {p: transition(rowsT[p:p + 1, :], bitT[p:p + 1, :])
                for p in order}
        new_sign = transition(s_sign, sign_bit)"""

TRANS_STUB = """        news = {p: rowsT[p:p + 1, :] + 1 for p in order}
        new_sign = s_sign + 1"""

WRITE_MARK = "        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)"
WRITE_END = "        outs = []"


def make_variant(name, src):
    if name == "no_read":
        src = src.replace(READ_LOOP, READ_STUB)
        src = src.replace(
            "            nb = jnp.where(wmask, nr128, blocks[lane])",
            "            nb = jnp.where(wmask, nr128, jnp.int8(0) * nr128)")
    elif name == "no_trans":
        src = src.replace(TRANS_BLOCK, TRANS_STUB)
    elif name == "no_write":
        i = src.index(WRITE_MARK)
        j = src.index(WRITE_END, i)
        src = src[:i] + src[j:]
    elif name == "no_chain":
        i = src.index("        outs = []")
        j = src.index("        if compact:", i)
        src = (src[:i] +
               "        outs = [rowsT[p:p + 1, :] + low + rng "
               "for p in order] + [s_sign + low + rng]\n" + src[j:])
    elif name == "no_masks":
        # replace actT/bitT/sign mask computation with constants
        i = src.index("        aR = jnp.abs(vR)")
        j = src.index("        # per-position transitions", i)
        src = (src[:i] + """        aR = jnp.abs(vR)
        ones32 = jnp.broadcast_to(jnp.int32(1), (32, L))
        actT = (posT >= 0) & (aR >= 0)
        bitT = ones32 - 1
        signsel = actT
        s_sign = rowsT[11:12, :]
        sign_bit = (vR < 0).astype(jnp.int32)
        sign_act = (aR >= 0)
""" + src[j:])
    elif name == "no_transpose":
        src = src.replace(
            """        rowsT = jax.lax.dot_general(
            eye32, rows8.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) & 0xFF""",
            "        rowsT = jnp.broadcast_to(jnp.int32(127), (32, L)) "
            "+ rows8[0, 0].astype(jnp.int32) * 0")
        src = src.replace(
            """        new_rows8 = jax.lax.dot_general(
            new_rowsT.astype(jnp.bfloat16), eye32,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32) & 0xFF
        new_rows8 = new_rows8.astype(jnp.int8)""",
            "        new_rows8 = jnp.broadcast_to(jnp.int8(127), (L, 32))"
            " + new_rowsT[0, 0].astype(jnp.int8) * 0")
    elif name == "full":
        pass
    spec = importlib.util.spec_from_loader(f"rcp_{name}", loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__name__"] = f"tpu_ffv1.tpu.rcp_{name}"
    src = src.replace(
        "from .rc_scan_fast import chain_order_nosign",
        "from tpu_ffv1.tpu.rc_scan_fast import chain_order_nosign")
    exec(compile(src, f"rcp_{name}.py", "exec"), mod.__dict__)
    return mod


from tpu_ffv1.core.rac import default_state_tables

L, CCr, N = 96, 1332, 129600
one_tab, zero_tab = default_state_tables()
ot, zt = jnp.asarray(one_tab), jnp.asarray(zero_tab)
rng = np.random.default_rng(0)
ctx = jnp.asarray(rng.integers(0, CCr, (L, N)).astype(np.int32))
diff = jnp.asarray(rng.integers(-20, 21, (L, N)).astype(np.int32))
act = jnp.asarray(np.ones((L, N), bool))
states0 = jnp.full((L, CCr, 32), 128, jnp.uint8)
low0 = jnp.zeros(L, jnp.int32)
range0 = jnp.full(L, 0xFF00, jnp.int32)

for name in sys.argv[1:] or ["full", "no_read", "no_trans", "no_write",
                             "no_chain", "no_masks", "no_transpose"]:
    try:
        mod = make_variant(name, SRC)
        f = jax.jit(lambda c, d, a, s, m=mod: m.rc_encode_pallas_packed(
            c, d, a, s, ot, zt, low0, range0, 8, 144)[0][0, 0, 0])
        np.asarray(f(ctx, diff, act, states0))
        ts = []
        for _ in range(2):
            t0 = time.time()
            np.asarray(f(ctx, diff, act, states0))
            ts.append(time.time() - t0)
        print(f"{name:12s}: {min(ts)*1e3:6.0f} ms  "
              f"({min(ts)/N*1e9:5.0f} ns/px)", flush=True)
    except Exception as e:
        print(f"{name:12s}: FAILED {str(e).splitlines()[0][:160]}",
              flush=True)
