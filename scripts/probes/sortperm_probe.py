"""Primitive-cost probe for the round-5 two-phase encode redesign.

The encode Pallas kernel's wall is the per-lane state read/write loops
(~5.4 cycles per stream element, fixed in L x N).  The candidate
restructure sorts each lane's (ctx, diff) stream stably by context, so
state evolution becomes a segmented scan with NO dynamic addressing
(each context's occurrences are contiguous; the running (32, L) row
carry lives in registers), then a second chain kernel consumes the
pre-update state values gathered back to time order.

Feasibility = cost of the XLA-side plumbing on the real chip:
  A. stable argsort of (L, N) int32 keys (CC=733 distinct values)
  B. permute ctx+diff into sorted order (take_along_axis x2)
  C. gather the (L, N, S) int8 s-values back to time order
  D. inverse-permutation construction (scatter iota vs double argsort)

Run: python scripts/probes/sortperm_probe.py [L N]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

L = int(sys.argv[1]) if len(sys.argv) > 1 else 120
N = int(sys.argv[2]) if len(sys.argv) > 2 else 196608
CC = 733
S = 18

rng = np.random.RandomState(7)
ctx = jnp.asarray(rng.randint(0, CC, (L, N)), jnp.int32)
diff = jnp.asarray(rng.randint(-30, 30, (L, N)), jnp.int32)
svals = jnp.asarray(rng.randint(0, 256, (L, N, S)), jnp.int8)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(a if a.ndim else a), out)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = fn(*args)
        # force: tiny fetch of each output's first element
        jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[0]), out)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{name}: median {ts[len(ts) // 2] * 1000:.1f} ms", flush=True)
    return out


@jax.jit
def sort_rank(ctx):
    # stable argsort by ctx per lane: rank[i] = sorted position
    return jnp.argsort(ctx, axis=1, stable=True)


@jax.jit
def permute2(ctx, diff, perm):
    return (jnp.take_along_axis(ctx, perm, axis=1),
            jnp.take_along_axis(diff, perm, axis=1))


@jax.jit
def inv_perm_scatter(perm):
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (L, N))
    inv = jnp.zeros((L, N), jnp.int32)
    return jax.vmap(lambda ip, p, io: ip.at[p].set(io))(inv, perm, iota)


@jax.jit
def inv_perm_argsort(perm):
    return jnp.argsort(perm, axis=1)


@jax.jit
def gather_back(sv, inv):
    return jnp.take_along_axis(sv, inv[:, :, None], axis=1)


@jax.jit
def gather_back_flat(sv2d, inv):
    # (L, N*S) int32 form: permute a flattened int32 view instead of
    # the trailing-dim int8 gather (layout comparison)
    return jnp.take_along_axis(sv2d, inv, axis=1)


perm = timeit("A argsort (L,N) stable", sort_rank, ctx)
timeit("B permute ctx+diff", permute2, ctx, diff, perm)
inv = timeit("D1 inverse perm (argsort)", inv_perm_argsort, perm)
try:
    timeit("D2 inverse perm (scatter)", inv_perm_scatter, perm)
except Exception as e:
    print(f"D2 scatter failed: {e}")
timeit("C gather-back (L,N,S) int8", gather_back, svals, inv)
sv32 = jnp.asarray(rng.randint(0, 2 ** 30, (L, N), np.int64),
                   jnp.int32)
timeit("C2 gather-back (L,N) int32 x1", gather_back_flat, sv32, inv)
