#!/usr/bin/env bash
# Multi-SF correctness sweep: run the full oracle gate at every SF the
# driver might use.  Round-2 lesson (q62): a query can pass at one SF and
# hash-fail at another (data-dependent NULL/empty divergence), so the
# pre-commit gate must sweep all of them.
set -uo pipefail
cd "$(dirname "$0")/.."
rc=0
for sf in sf0.001 sf0.01 ${SWEEP_FULL:+sf0.1}; do
  echo "=== $sf ==="
  python tools/verify_local.py "/root/testdata/$sf" "$@" || rc=1
done
exit $rc
