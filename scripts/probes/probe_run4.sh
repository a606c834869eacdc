#!/bin/bash
cd /root/repo
echo "=== hwcheck4 (slab + golomb-dec + mesh1-pallas) ===" >> /tmp/probe.log
timeout 3000 python bench.py --check >> /tmp/probe.log 2>&1
echo "=== dechw4 (ctx=1) ===" >> /tmp/probe.log
timeout 3000 python scripts/dec_pallas_hw.py >> /tmp/probe.log 2>&1
echo "=== enct4 (slab steady) ===" >> /tmp/probe.log
timeout 2400 python scripts/probe_suite.py enct4 >> /tmp/probe.log 2>&1
echo "=== probe_run4 done ===" >> /tmp/probe.log
