"""Multi-chip slice sharding: the framework's distributed layer.

The reference's only parallelism is slice threads + frame pipelining over
POSIX threads (SURVEY §2.3, pthread_slice.c / pthread_frame.c).  The
TPU-native equivalent: FFV1 slices are fully independent bitstreams, so a
frame's (or a batch of frames') slice lanes shard across a device mesh on
a single "slices" axis; the only cross-device data motion is gathering
per-slice byte counts/payloads for footer-chain assembly — exactly the
NCCL-free analog called out in SURVEY §5.

``encode_lanes_sharded`` runs the lane-major scan under shard_map: each
device owns L/ndev lanes (slice streams), scans them locally, and the
host assembles the footer chain from the gathered outputs.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .rc_scan_lanes import finalize_lanes, rc_encode_scan_lanes


def make_mesh(n_devices: int | None = None, axis: str = "slices") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def encode_lanes_sharded(mesh: Mesh, ctx, diff, active, states0,
                         one_tab, zero_tab, lows, ranges, prefixes, plens,
                         bits: int):
    """Shard the lane dimension of the encode scan over the mesh.

    All lane-major arrays are partitioned on axis 0 ("slices"); state
    tables stay device-resident per shard across frames.  Returns
    (bytes uint8[L, CAP], counts int32[L], states_out) with outputs
    sharded the same way (host gathers what it consumes).
    """
    axis = mesh.axis_names[0]
    lane_sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def run(ctx, diff, active, states0, one_tab, zero_tab, lows, ranges,
            prefixes, plens):
        prov, valid, low, rng, states_out = rc_encode_scan_lanes(
            ctx, diff, active, states0, one_tab, zero_tab, lows, ranges,
            bits)
        out, counts = finalize_lanes(prov, valid, low, rng,
                                     prefixes, plens)
        return out, counts, states_out

    args = [jax.device_put(a, lane_sharded)
            for a in (ctx, diff, active, states0)]
    tabs = [jax.device_put(t, repl) for t in (one_tab, zero_tab)]
    scalars = [jax.device_put(a, lane_sharded)
               for a in (lows, ranges, prefixes, plens)]
    return run(args[0], args[1], args[2], args[3], tabs[0], tabs[1],
               *scalars)
