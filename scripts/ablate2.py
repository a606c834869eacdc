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

WRITE_STUB_MARK = "        for lane in range(L):\n            ci = ctx_ref[i, lane]\n            base = pl.multiple_of((ci >> 5) * 8, 8)\n            # lane's row from new_rows: 8-aligned STATIC slice (vreg"
TRANS_BLOCK = """        onehot = (rows8[..., None] == iota256.astype(jnp.int8)
                  .reshape(1, 1, 256)).astype(jnp.int8) \\
            .reshape(L * 32, 256)"""


def make_variant(name, src):
    if name == "no_read":
        src = src.replace(READ_LOOP, READ_STUB)
        # write path needs blocks[lane]; replace the where with plain
        src = src.replace("            nb = jnp.where(wmask, nr128, blocks[lane])",
                          "            nb = jnp.where(wmask, nr128, jnp.int8(0) * nr128)")
    elif name == "no_write":
        i = src.index(WRITE_STUB_MARK)
        j = src.index("        # chain-side masks", i)
        src = src[:i] + src[j:]
    elif name == "no_trans":
        i = src.index(TRANS_BLOCK)
        j = src.index("        lane128 = ", i)
        src = (src[:i] +
               "        new_rows8 = rows8 + jnp.int8(1)\n" + src[j:])
    elif name == "no_chain":
        i = src.index("        outs = []")
        j = src.index("        if compact:", i)
        src = (src[:i] +
               "        outs = [rowsT[p:p + 1, :] + low + rng for p in order]\n"
               + src[j:])
    elif name == "full":
        pass
    spec = importlib.util.spec_from_loader(f"rcp_{name}", loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__name__"] = f"tpu_ffv1.tpu.rcp_{name}"
    # exec in a package-like namespace so relative imports resolve
    src = src.replace("from .rc_scan_fast import chain_order",
                      "from tpu_ffv1.tpu.rc_scan_fast import chain_order")
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
                             "no_chain"]:
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
        print(f"{name:9s}: {min(ts)*1e3:6.0f} ms  "
              f"({min(ts)/N*1e9:5.0f} ns/px)", flush=True)
    except Exception as e:
        print(f"{name:9s}: FAILED {str(e).splitlines()[0][:160]}",
              flush=True)
