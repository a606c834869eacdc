#!/bin/bash
cd /root/repo
echo "=== hwcheck (w3 + feed + group finalize) ===" >> /tmp/probe.log
timeout 2400 python bench.py --check >> /tmp/probe.log 2>&1
echo "=== dechw ===" >> /tmp/probe.log
timeout 2400 python scripts/dec_pallas_hw.py >> /tmp/probe.log 2>&1
echo "=== pipe (group finalize) ===" >> /tmp/probe.log
timeout 1800 python scripts/ablate3.py pipe >> /tmp/probe.log 2>&1
echo "=== enc4 ===" >> /tmp/probe.log
timeout 2400 python scripts/probe_suite.py enc4 >> /tmp/probe.log 2>&1
echo "=== encnu4 ===" >> /tmp/probe.log
timeout 2400 python scripts/probe_suite.py encnu4 >> /tmp/probe.log 2>&1
echo "=== dec4 ===" >> /tmp/probe.log
timeout 2400 python scripts/probe_suite.py dec4 >> /tmp/probe.log 2>&1
echo "=== probe_run3 done ===" >> /tmp/probe.log
