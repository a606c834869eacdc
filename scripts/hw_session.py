#!/usr/bin/env python3
"""One-shot real-hardware session: run everything that needs the chip.

The dev tunnel comes and goes; when it is up, run this once —
  python scripts/hw_session.py [--quick]
It executes, in order, with per-step wall budgets and a log:
  1. bench.py --check            (byte-exactness of all device paths,
                                  incl. the lane-gather lookups)
  2. decode batch sweep          (decode-sink ms/step at batch 4/5/6/8,
                                  gather on vs off -> best default)
  3. bench.py full               (the artifact numbers)
Results append to hw_session.log (JSON lines) so partial sessions
still leave data behind.
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "hw_session.log")


def log_result(step, payload):
    rec = dict(step=step, **payload)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[hw_session] {step}: {json.dumps(payload)[:300]}",
          flush=True)


def run(cmd, timeout, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, cwd=ROOT, env=e, capture_output=True,
                           text=True, timeout=timeout)
        return dict(rc=r.returncode, dt=round(time.time() - t0, 1),
                    tail=r.stdout[-2000:], err=r.stderr[-2000:])
    except subprocess.TimeoutExpired:
        return dict(rc=-1, dt=round(time.time() - t0, 1),
                    tail="", err=f"timeout {timeout}s")


def main():
    quick = "--quick" in sys.argv
    py = sys.executable

    # 1. parity check (validates the gather kernels on real HW)
    r = run([py, "bench.py", "--check"], timeout=2400)
    log_result("check", r)
    if r["rc"] != 0:
        # isolate which new kernel path breaks on HW
        r2 = run([py, "bench.py", "--check"], timeout=2400,
                 env={"FFV1_PALLAS_GATHER": "0"})
        log_result("check_gather_off", r2)
        if r2["rc"] == 0:
            log_result("conclusion", dict(
                note="gather path FAILS on HW, legacy path passes -> "
                     "flip FFV1_PALLAS_GATHER default to 0"))
            return 0
        r3 = run([py, "bench.py", "--check"], timeout=2400,
                 env={"FFV1_PALLAS_EXT": "0"})
        log_result("check_ext_off", r3)
        if r3["rc"] == 0:
            log_result("conclusion", dict(
                note="ext kernel FAILS on HW, fast-only passes -> "
                     "flip FFV1_PALLAS_EXT default to 0"))
        return 1 if r3["rc"] else 0

    # 2. the full artifact FIRST: tunnel windows can be short, and the
    # full bench is what persists BENCH_HW_LAST.json — the one artifact
    # that survives a dead tunnel at driver-bench time (VERDICT r3 #1).
    # Sweeps run after; a cut-off session still leaves the headline.
    r = run([py, "bench.py"], timeout=5400,
            env={"FFV1_BENCH_PROBE_WINDOW": "0"})
    log_result("bench_full", r)

    # 3a. encode device-source batch sweep (VERDICT lever (a): scan
    # cost grows sub-linearly with lanes -> larger batch = more Mpix/s),
    # each batch also with the host-compact finalize (kills the ~60 ms
    # device sort; pays ~1.6x payload download — measure, don't guess)
    if not quick:
        for batch in ("5", "8", "12", "16"):
            for hc in ("0", "1"):
                r = run([py, "-c", (
                    "import bench, os;"
                    "f = bench.synth_1080p();"
                    "m, s = bench.bench_tpu_device_source(f, budget_s=150);"
                    "import json; print(json.dumps(dict(mpix=m, **s)))")],
                    timeout=2400,
                    env={"FFV1_BENCH_BATCH": batch,
                         "FFV1_BENCH_STEPS": "8",
                         "FFV1_TPU_HOSTCOMPACT": hc})
                log_result(f"encode_devsrc_b{batch}_hc{hc}", r)

    # 3b. decode-sink batch sweep (the decode >= host C lever)
    if not quick:
        for gather in ("1", "0"):
            for batch in ("5", "8") if gather == "0" else ("4", "5",
                                                           "6", "8"):
                r = run([py, "-c", (
                    "import bench, os;"
                    "f = bench.synth_1080p();"
                    "m, s = bench.bench_tpu_decode_sink(f, budget_s=120);"
                    "import json; print(json.dumps(dict(mpix=m, **s)))")],
                    timeout=1800,
                    env={"FFV1_BENCH_BATCH": batch,
                         "FFV1_PALLAS_GATHER": gather})
                log_result(f"decode_sink_b{batch}_g{gather}", r)

    return 0


if __name__ == "__main__":
    sys.exit(main())
