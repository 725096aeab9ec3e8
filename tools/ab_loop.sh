#!/bin/bash
# Steal-gated A/B loop: alternates pipeline-run variants, logging each
# run's wall-clock together with the JVM's own process-CPU and GC time
# (steal-immune, from BenchRun's PROC_CPU/GC_SEC markers) plus the
# host steal%/busy% sampled across the run from /proc/stat, so
# contended wall-clock samples can be excluded while the core-second
# numbers remain valid in ANY window.
#
# Usage: tools/ab_loop.sh <cores> <cpulist> <rows> <iterations>
# Variants are (label, extra-conf, extra-jvm-flags) triples; edit below.
set -u
CORES="$1"; CPUS="$2"; ROWS="$3"; ITERS="$4"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
# JDK17 module opens (inlined — mirrors build.sbt jdk17AddOpens; do NOT
# scrape them from /tmp, which may not exist on a fresh host)
JF=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  JF="$JF --add-opens $p=ALL-UNNAMED"
done

VARIANT_LABELS=(base offheap)
VARIANT_CONFS=("" "spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=8g")
VARIANT_JFLAGS=("" "")

run_one() { # label conf jflags
  local label="$1" conf="$2" jflags="$3"
  local a b out
  a=($(head -1 /proc/stat))
  out=$(SPARK_GRAFT_CONF="$conf" taskset -c "$CPUS" \
      java $JF -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xms12g -Xmx12g -XX:+UseParallelGC $jflags -XX:ActiveProcessorCount="$CORES" \
      -cp "$CP" graft.BenchRun pipeline "$CORES" "$ROWS" 2>/dev/null \
      | grep -E '^(ELAPSED|PROC_CPU)' | tr '\n' ' ')
  b=($(head -1 /proc/stat))
  python3 - "$label" "${out:-FAIL}" "${a[@]:1:8}" "${b[@]:1:8}" <<'EOF'
import sys
label, out = sys.argv[1], sys.argv[2]
a = list(map(int, sys.argv[3:11])); b = list(map(int, sys.argv[11:19]))
d = [y - x for x, y in zip(a, b)]
total = sum(d)
steal = 100.0 * d[7] / total if total else 0.0
busy = 100.0 * (total - d[3] - d[4]) / total if total else 0.0
print(f"{label} {out.strip()} steal_pct={steal:.1f} busy_pct={busy:.1f}", flush=True)
EOF
}

for i in $(seq 1 "$ITERS"); do
  for v in "${!VARIANT_LABELS[@]}"; do
    run_one "${VARIANT_LABELS[$v]}" "${VARIANT_CONFS[$v]}" "${VARIANT_JFLAGS[$v]}"
  done
done
