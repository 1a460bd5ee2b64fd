#!/bin/bash
# Round-ENTRY driver-bench adjudication (r13, VERDICT r12 item 4).
#
# The driver benches AFTER the round commit, so its BENCH_r*.json can
# carry floor flags the gate never arbitrated (r12: seven unadjudicated
# flags). The driver record's per-query JSON is also truncated (only a
# "tail" string survives), so it cannot be diffed directly. The
# structural fix: at round entry, re-run the full bench on the SAME
# committed code, diff that fresh record against the committed floor,
# and solo-recheck every flag — a fresh identical-code record either
# reproduces a driver flag (solo recheck decides) or clears it.
#
# Usage: bash tools/adjudicate_driver_bench.sh [extra_flags_csv]
#   extra_flags_csv = names from the driver record / verdict to force
#   into the solo recheck even if the fresh suite run clears them.
# Output: /tmp/entry_bench.json, /tmp/entry_solo.txt; bench_floor.json
# is min-merged by solo_recheck for every adjudicated-noise flag.
# Exit 0 = all flags noise (or none); 1 = a real regression reproduces.
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do echo -n "--add-opens=java.base/$p=ALL-UNNAMED "; done)
CP="target/scala-2.13/classes:/opt/spark/jars/*"

echo "== entry bench (fresh record of committed code) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/entry_bench.json \
  java $ADD_OPENS -XX:ReservedCodeCacheSize=1g -Xmx16g -cp "$CP" \
  graft.Bench 2>&1 | grep -E '^BENCH' | tail -3

python3 tools/bench_diff.py --gate HEAD /tmp/entry_bench.json > /tmp/entry_bench_diff.txt 2>&1 \
  && DIFF_OK=1 || DIFF_OK=0
cat /tmp/entry_bench_diff.txt
FLAGGED=$(grep '^FLAGGED ' /tmp/entry_bench_diff.txt | cut -d' ' -f2)
if [ "$DIFF_OK" = "0" ] && [ -z "$FLAGGED" ]; then
  echo "ENTRY: bench_diff failed without a FLAGGED line — infrastructure error"
  exit 1
fi
# union with any caller-supplied driver/verdict flags
if [ -n "$1" ]; then
  FLAGGED=$(echo "$FLAGGED,$1" | tr ',' '\n' | grep -v '^$' | sort -u | paste -sd,)
fi
if [ -z "$FLAGGED" ]; then
  echo "ENTRY ADJUDICATION CLEAN: no flags to recheck"
  exit 0
fi

echo "== solo recheck: $FLAGGED =="
for _ in $(seq 60); do
  LOAD1=$(cut -d' ' -f1 /proc/loadavg)
  awk "BEGIN{exit !($LOAD1 < 1.5)}" && break
  sleep 10
done
echo "recheck starting at load $(cut -d' ' -f1-3 /proc/loadavg)"
java $ADD_OPENS -XX:ReservedCodeCacheSize=1g -Xmx16g -cp "$CP" \
  graft.tools.ScaleBench3 --solo "$FLAGGED" \
  /root/testdata/sf0.1:1 /root/testdata/sf0.1:1 /root/testdata/sf0.1:1 2>/dev/null > /tmp/entry_solo.txt
grep -E "^(SOLO|  \|)" /tmp/entry_solo.txt
python3 tools/solo_recheck.py "$FLAGGED" /tmp/entry_solo.txt
echo "ENTRY ADJUDICATION DONE — commit the merged bench_floor.json with the round"
