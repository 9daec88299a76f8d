#!/usr/bin/env bash
# Snapshot guard (VERDICT r16 #2): round 16 shipped an end-of-round commit
# that did not compile (Bpe.scala referenced a deleted val), zeroing the
# entire correctness gate. This script is the ONLY sanctioned way to make
# a snapshot/closing commit: it refuses to commit unless `sbt Test/compile`
# exits 0, so a broken tree can never become the round's HEAD.
#
# Usage: tools/snapshot.sh "commit message"
#   GRAFT_SNAPSHOT_FULL_TEST=1 tools/snapshot.sh "msg"   # gate on full `sbt test`
#
# The compile gate is the MINIMUM (fast, catches the r16 failure class);
# the round protocol still calls for a full `sbt test` before the closing
# snapshot — set GRAFT_SNAPSHOT_FULL_TEST=1 for that stronger gate when
# time allows.
set -euo pipefail
cd "$(dirname "$0")/.."

msg="${1:?usage: tools/snapshot.sh \"commit message\"}"

if [[ "${GRAFT_SNAPSHOT_FULL_TEST:-0}" == "1" ]]; then
  echo "[snapshot] gate: sbt test (full)"
  sbt -batch test
else
  echo "[snapshot] gate: sbt Test/compile"
  sbt -batch Test/compile
fi

echo "[snapshot] gate green — committing"
git add -A
git commit -m "$msg"
echo "[snapshot] committed $(git rev-parse --short HEAD)"
