#!/bin/bash
# The FFV1_SLOW_TESTS=1 pass: Mosaic-interpret kernel matrices too slow
# for the default suite (the pixel-serial decode kernels take tens of
# minutes each under the interpreter).  Run nightly / before a round
# ends; real-HW validation of the same kernels is bench.py --check.
set -e
cd "$(dirname "$0")/.."
JAX_PLATFORMS=cpu FFV1_SLOW_TESTS=1 \
  python -m pytest tests/test_pallas.py -q "$@"
