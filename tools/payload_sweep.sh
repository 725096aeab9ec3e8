#!/bin/bash
# Payload sweep: the same 8M-row pipeline pair (4c vs 16c) at shrinking
# token payloads (SPARK_GRAFT_MAXTOK). The per-row work OUTSIDE the token
# payload (doc_id render, regexes, enrich join, route shuffle metadata)
# is identical at every level, so efficiency recovered as bytes/row
# shrink was host-bus-bound, not plan-bound. Each level runs under
# taskset + ActiveProcessorCount so GC/JIT pools match a real N-core
# executor (same discipline as Bench's forked mode).
#
# Usage: tools/payload_sweep.sh [rows] [reps]   (defaults 8000000, 2)
set -u
ROWS="${1:-8000000}"
REPS="${2:-2}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
JVM_FLAGS=(
  --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC
  -Xms12g -Xmx12g -XX:+UseParallelGC
)

run() { # run <cores> <cpulist> <maxtok>
  local cores="$1" cpus="$2" maxtok="$3"
  local t
  t=$(SPARK_GRAFT_MAXTOK="$maxtok" taskset -c "$cpus" \
      java "${JVM_FLAGS[@]}" -XX:ActiveProcessorCount="$cores" -cp "$CP" \
      graft.BenchRun pipeline "$cores" "$ROWS" 2>/dev/null | grep -o 'ELAPSED [0-9.]*' | cut -d' ' -f2)
  echo "maxtok=$maxtok cores=$cores elapsed=${t:-FAIL}"
}

for rep in $(seq 1 "$REPS"); do
  for maxtok in 16 64 256 1988; do
    run 4 0-3 "$maxtok"
    run 16 0-15 "$maxtok"
  done
done
