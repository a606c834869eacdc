#!/usr/bin/env python3
"""Watch for the accelerator tunnel to come up; run the HW session.

The axon tunnel flaps (multi-hour outages that end on their own), and
jax device init BLOCKS FOREVER while it is down.  This watcher probes
device bring-up in a subprocess with a hard timeout every PERIOD
seconds and, the moment a probe succeeds, runs scripts/hw_session.py
(check -> full bench -> sweeps), which persists HWCHECK.json and
BENCH_HW_LAST.json.  Run it under tmux and forget about it:

    python scripts/tunnel_watch.py [--once-session] [--quick]

State lines append to tunnel_watch.log.  --once-session exits after
the first completed HW session; otherwise it keeps watching (a later
window re-runs the session, refreshing the dated artifacts).
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "tunnel_watch.log")
PERIOD = float(os.environ.get("FFV1_WATCH_PERIOD", "300"))
PROBE_TIMEOUT = float(os.environ.get("FFV1_WATCH_PROBE_TIMEOUT", "150"))


def log(event, **kw):
    rec = dict(ts=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
               event=event, **kw)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[tunnel_watch] {event} {kw}", flush=True)


def probe():
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print(d[0].platform, len(d))"],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT,
            cwd=ROOT)
        if r.returncode == 0 and "tpu" in r.stdout:
            return True
    except subprocess.TimeoutExpired:
        pass
    except OSError:
        pass
    return False


def main():
    once = "--once-session" in sys.argv
    quick = "--quick" in sys.argv
    log("start", period_s=PERIOD, once_session=once, quick=quick)
    n = 0
    while True:
        n += 1
        if probe():
            log("tunnel_up", probes=n)
            cmd = [sys.executable, "scripts/hw_session.py"]
            if quick:
                cmd.append("--quick")
            t0 = time.time()
            r = subprocess.run(cmd, cwd=ROOT)
            log("hw_session_done", rc=r.returncode,
                dt_s=round(time.time() - t0, 1))
            if once:
                return 0
            # session done; next window (much later) refreshes again
            time.sleep(max(PERIOD * 6, 1800))
            n = 0
        else:
            if n % 6 == 1:
                log("tunnel_down", probes=n)
            time.sleep(PERIOD)


if __name__ == "__main__":
    sys.exit(main())
