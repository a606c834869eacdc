"""Break down one steady-state TPUFFV1Encoder step on hardware:
input conversion/transfer, device dispatch+compute, counts sync,
output transfer, host assembly.  Run on the axon TPU (no env tweaks).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from tpu_ffv1.codec.params import EncoderParams
from tpu_ffv1.tpu.encoder import TPUFFV1Encoder


def synth(n=4, seed=0):
    rng = np.random.RandomState(seed)
    base = (np.add.outer(np.arange(1080), np.arange(1920)) % 256)
    out = []
    for t in range(n):
        y = ((base + t * 3) + rng.randint(0, 16, (1080, 1920))).astype(np.uint8)
        u = (rng.randint(0, 8, (540, 960)) + 100).astype(np.uint8)
        v = (rng.randint(0, 8, (540, 960)) + 160).astype(np.uint8)
        out.append([y, u, v])
    return out


def main():
    batch = 4
    frames = synth()
    enc = TPUFFV1Encoder(EncoderParams(
        width=1920, height=1080, pix_fmt="yuv420p", level=3, coder=2,
        slices=24), batch=batch)
    streams = [frames[i % 4] for i in range(batch)]
    print("compile...", flush=True)
    t0 = time.time()
    enc.encode_frames(streams)
    print(f"first step: {time.time()-t0:.1f}s", flush=True)

    for rep in range(3):
        streams = [frames[(i + rep + 1) % 4] for i in range(batch)]
        t0 = time.time()
        # stacked per plane type, matching submit_frames
        nplanes = len(streams[0])
        dev = tuple(jnp.asarray(np.stack([np.asarray(s[k]) for s in streams]))
                    for k in range(nplanes))
        jax.block_until_ready(dev)
        t1 = time.time()
        keyframe = False
        lows = np.zeros(enc.L, np.int32)
        ranges = np.zeros(enc.L, np.int32)
        from tpu_ffv1.tpu.encoder import PREFIX_CAP
        prefixes = np.zeros((enc.L, PREFIX_CAP), np.int32)
        plens = np.zeros(enc.L, np.int32)
        for si in range(enc.n_slices):
            lo, ra, prov = enc._host_prefix(si, keyframe)
            for bi in range(batch):
                lane = bi * enc.n_slices + si
                lows[lane], ranges[lane] = lo, ra
                prefixes[lane, :len(prov)] = prov
                plens[lane] = len(prov)
        t2 = time.time()
        res = enc._frame_fn(dev, enc.states, jnp.asarray(lows),
                            jnp.asarray(ranges), jnp.asarray(prefixes),
                            jnp.asarray(plens))
        out, counts, states_out, overflow, packed, low, rng = res
        counts_np = np.asarray(counts)            # device sync point
        t3 = time.time()
        enc.states = states_out
        cap2 = min(enc.out_cap, (int(counts_np.max()) + 511) // 512 * 512)
        out_np = np.asarray(out[:, :cap2])
        t4 = time.time()
        payloads = [bytes(out_np[li, :counts_np[li]]) for li in range(enc.L)]
        pkts = []
        for bi in range(batch):
            sl = payloads[bi * enc.n_slices:(bi + 1) * enc.n_slices]
            pkts.append(enc._assemble(sl))
        enc.picture_number += 1
        t5 = time.time()
        print(f"rep{rep}: input_conv+xfer {t1-t0:.3f}s  prefix {t2-t1:.3f}s  "
              f"dispatch+compute {t3-t2:.3f}s  out_xfer({cap2}B/lane) "
              f"{t4-t3:.3f}s  assemble {t5-t4:.3f}s  total {t5-t0:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
