#!/usr/bin/env python3
"""Run the full-geometry 4K config-5 dry-run leg (FFV1_DRYRUN_4K=1)
and record DRYRUN_4K.json.  ~25 min on a CPU mesh (the 4K entropy
scan is pixel-serial per slice); run when the box is quiet.

  python scripts/dryrun_4k.py [n_devices]
"""
import os
import sys

os.environ["FFV1_DRYRUN_4K"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402

__graft_entry__.dryrun_multichip(
    int(sys.argv[1]) if len(sys.argv) > 1 else 8)
