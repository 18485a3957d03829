#!/bin/bash
# Crossover pass 4: the decisive cold cells. Pass 3's measured RSS
# (~1.5-2 G, well under Xmx) left slack ~3-5 G, so the 1.8 G tier fully
# re-warmed and the 7.1 G tier was only ~40% un-cached. Hogs re-sized
# from measured RSS to pin slack at ~1 G.
set -u
cd /root/repo
OUT="${1:-target/xover/crossover4.log}"
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
M=$((1024*1024))

drop; cgrun cold2b $((18*G)) $((15*G+512*M)) 3g 4 scan 128000000 32768 5
drop; cgrun cold3b $((18*G)) $((15*G)) 5g 8 scan 512000000 32768 5

grep -E "RESULT" "$OUT"
