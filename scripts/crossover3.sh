#!/bin/bash
# Crossover pass 3 (final cells):
#
# COLD cells — the slack problem: a cgroup limit alone does NOT cap the
# page cache at (limit - Xmx), because the scan JVM's RSS stays far
# below Xmx and the tier re-warms into the gap (pass 2's "cold" 7.1 GB
# cell read 2.1 s). Fix: pin an UNEVICTABLE /dev/shm hog inside the
# same cgroup (shmem cannot be reclaimed without swap), so
# slack = limit - hog - RSS is controlled exactly. 8 threads (cold
# scans are disk-bound; 32-thread decode was the OOM, not the disk).
#
# POINT cells — every map shard must stay storage-resident for the
# flatness claim to be the structure's (a spilled shard re-reads per
# probe): heap sized so 0.6*(Xmx-0.3G) >= total map bytes (~48 B/row),
# 16 fold threads to bound the build transient.
set -u
cd /root/repo
OUT="${1:-target/xover/crossover3.log}"
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

cgrun() { # cgrun <name> <limit_bytes> <hog_bytes> <xmx> <cpus> <args...>
  local name="$1" limit="$2" hog="$3" xmx="$4" cpus="$5"; shift 5
  local cg="/sys/fs/cgroup/memory/xover_$name"
  mkdir -p "$cg"
  echo "$limit" > "$cg/memory.limit_in_bytes"
  if [ "$hog" -gt 0 ]; then
    ( echo $BASHPID > "$cg/cgroup.procs"
      head -c "$hog" /dev/zero > /dev/shm/xover_hog ) 2>> "$OUT"
  fi
  ( echo $BASHPID > "$cg/cgroup.procs"
    export SPARK_GRAFT_CPUS="$cpus"
    exec java $OPENS $JFLAGS -Xmx$xmx -cp "$CP" graft.tools.ProbeCrossover "$@"
  ) >> "$OUT" 2>&1
  rm -f /dev/shm/xover_hog
}
drop() { sync; echo 3 > /proc/sys/vm/drop_caches; }
G=$((1024*1024*1024))

echo "== cold (shm hog pins slack ~1-2G) ==" | tee -a "$OUT"
drop; cgrun cold1 $((18*G)) $((13*G)) 4g 8 scan 32000000  32768 5
drop; cgrun cold2 $((18*G)) $((13*G)) 4g 8 scan 128000000 32768 5
drop; cgrun cold3 $((18*G)) $((11*G)) 5g 8 scan 512000000 32768 5

echo "== point (all shards storage-resident) ==" | tee -a "$OUT"
drop; cgrun point1 $((10*G)) 0 7g  16 point 32000000  32768 5
drop; cgrun point2 $((16*G)) 0 12g 16 point 128000000 32768 5
drop; cgrun point3 $((62*G)) 0 56g 16 point 512000000 32768 5

echo "== keysweep ==" | tee -a "$OUT"
cgrun point3 $((62*G)) 0 56g 16 keysweep 512000000 0 5

grep -E "RESULT|build\+probe" "$OUT"
