#!/usr/bin/env bash
# Full-suite deflake certification (VERDICT r8 #2): run the ENTIRE sbt
# test suite N times consecutively at a reduced heap, so cached-block
# lifecycle races (the StoreFormatSpec "Block rdd_* does not exist"
# one-in-N) surface under the same memory pressure that produced them.
# Exits non-zero on the first failure and leaves the log behind.
#
#   scripts/stress_suite.sh [N=3] [HEAP=3g]
set -u
N=${1:-3}
HEAP=${2:-3g}

fails=0
for i in $(seq "$N"); do
  if SPARK_DRIVER_MEM="$HEAP" sbt -batch test \
      > "/tmp/stress_suite_$i.log" 2>&1; then
    echo "run $i: PASS ($(grep -oE 'Tests: succeeded [0-9]+' \
      "/tmp/stress_suite_$i.log" | tail -1))"
  else
    echo "run $i: FAIL (log: /tmp/stress_suite_$i.log)"
    grep -E "\*\*\* FAILED|SparkException|does not exist" \
      "/tmp/stress_suite_$i.log" | head -5
    fails=$((fails + 1))
    break
  fi
done
exit "$fails"
