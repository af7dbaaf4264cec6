#!/bin/bash
# Populate the per-boot XLA:CPU compile cache for the test suite, one test
# file per process. Run this once after boot (or after solver-default
# changes); afterwards `python -m pytest tests/` runs warm and write-free.
#
# Why per-process: persistent-cache WRITES segfault XLA:CPU after enough
# compilation state accumulates in a single process (see tests/conftest.py).
# Fresh processes keep each file's write volume small.
cd "$(dirname "$0")/.."
export DIFFDART_WARM_CACHE=1
rc=0
for f in tests/test_*.py; do
  echo "=== warming $f"
  timeout 1800 python -m pytest "$f" -q -x || rc=1
done
exit $rc
