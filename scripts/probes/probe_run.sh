#!/bin/bash
# Sequential probe driver: run stages one after another, logging to /tmp/probe.log
for st in "$@"; do
  echo "=== stage $st ===" >> /tmp/probe.log
  timeout 2400 python scripts/probe_suite.py "$st" >> /tmp/probe.log 2>&1
done
echo "=== all done ===" >> /tmp/probe.log
