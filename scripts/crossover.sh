#!/bin/bash
# Point-vs-scan probe crossover in the IO-bound regime (round 20).
#
# Runs graft.tools.ProbeCrossover cells inside cgroup-v1 memory limits
# so the tier parquet bytes do NOT fit the page cache available to the
# scan-path reader (anon/JVM heap is never swapped, page cache is
# reclaimed first — so the limit caps exactly the thing under test).
# Cells:
#   scan_warm  — unconstrained: the memory-bandwidth pass (r19's regime)
#   scan_cold  — 8 GiB cgroup, 6g heap: every pass reads the tier from
#                disk once tier >> the ~1.5 GiB page-cache slack
#   point      — cgroup sized to maps+slack: steady-state probes touch
#                zero tier bytes, so the cap proves no cache assist
# Caches are dropped before each constrained cell; probe keys are
# computed (never read from the tier).
#
# Usage: scripts/crossover.sh [out.log]
set -u
cd /root/repo
OUT="${1:-target/xover/crossover.log}"
mkdir -p target/xover "$(dirname "$OUT")"
: > "$OUT"

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

cgrun() { # cgrun <name> <limit_bytes> <xmx> <args...>
  local name="$1" limit="$2" xmx="$3"; shift 3
  local cg="/sys/fs/cgroup/memory/xover_$name"
  mkdir -p "$cg"
  echo "$limit" > "$cg/memory.limit_in_bytes"
  ( echo $BASHPID > "$cg/cgroup.procs"
    exec java $OPENS $JFLAGS -Xmx$xmx -cp "$CP" graft.tools.ProbeCrossover "$@"
  ) >> "$OUT" 2>&1
}

drop() { sync; echo 3 > /proc/sys/vm/drop_caches; }

G=$((1024*1024*1024))

# tier sizes: ~0.5 / ~2 / ~8.5 GB on disk (16x span)
SIZES=(32000000 128000000 512000000)
# point-cell budget: maps are ~90 B/row on heap; cap = heap + 4 GiB
XMX_POINT=(8g 16g 56g)
LIM_POINT=($((12*G)) $((20*G)) $((60*G)))

for i in "${!SIZES[@]}"; do
  n="${SIZES[$i]}"
  echo "== tier rows=$n ==" | tee -a "$OUT"
  java $OPENS $JFLAGS -Xmx16g -cp "$CP" graft.tools.ProbeCrossover gen "$n" >> "$OUT" 2>&1
  # warm scan: unconstrained, first run primes the cache (median drops it)
  cgrun warm $((110*G)) 8g scan "$n" 32768 5
  # cold scan: the IO-bound regime — tier >> page-cache slack
  drop
  cgrun cold $((8*G)) 6g scan "$n" 32768 5
  # point: maps resident on heap, tier uncacheable within the limit
  drop
  cgrun point "${LIM_POINT[$i]}" "${XMX_POINT[$i]}" point "$n" 32768 5
done

# O(batch-keys) axis at the largest tier (reference asv point-lookup shape)
drop
cgrun point "${LIM_POINT[2]}" "${XMX_POINT[2]}" keysweep "${SIZES[2]}" 0 5

grep RESULT "$OUT"
