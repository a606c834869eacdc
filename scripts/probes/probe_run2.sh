#!/bin/bash
cd /root/repo
echo "=== dec4 (new feed) ===" >> /tmp/probe.log
timeout 2400 python scripts/probe_suite.py dec4 >> /tmp/probe.log 2>&1
echo "=== enc4 (new write) ===" >> /tmp/probe.log
timeout 2400 python scripts/probe_suite.py enc4 >> /tmp/probe.log 2>&1
echo "=== ablate w3 ===" >> /tmp/probe.log
timeout 1800 python scripts/ablate3.py enc w3 >> /tmp/probe.log 2>&1
echo "=== ablate pipe ===" >> /tmp/probe.log
timeout 1800 python scripts/ablate3.py pipe >> /tmp/probe.log 2>&1
echo "=== probe_run2 done ===" >> /tmp/probe.log
