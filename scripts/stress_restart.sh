#!/usr/bin/env bash
# Deflake certification for the checkpoint-restart streaming test
# (VERDICT r5 #3): run the restart test N times consecutively while
# saturating half the cores with busy spinners, so awaitTermination
# races surface. Exits non-zero on the first failure.
#
#   scripts/stress_restart.sh [N=20] [SPINNERS=16] [SUITE] [SUBSTR]
# defaults certify StreamingSpec's ingest restart; pass e.g.
#   scripts/stress_restart.sh 10 16 graft.streaming.SemanticDedupSpec "streamed batches"
# for the semantic-dedup restart path.
set -u
N=${1:-20}
SPINNERS=${2:-16}
SUITE=${3:-graft.streaming.StreamingSpec}
SUBSTR=${4:-restart from checkpoint}

spin_pids=()
for _ in $(seq "$SPINNERS"); do
  (while :; do :; done) &
  spin_pids+=($!)
done
trap 'kill "${spin_pids[@]}" 2>/dev/null' EXIT

fails=0
for i in $(seq "$N"); do
  if sbt -batch "testOnly $SUITE -- -z \"$SUBSTR\"" \
      > "/tmp/stress_restart_$i.log" 2>&1; then
    echo "run $i: PASS"
  else
    echo "run $i: FAIL (log: /tmp/stress_restart_$i.log)"
    fails=$((fails+1))
  fi
done
echo "== $((N-fails))/$N passed"
exit "$fails"
