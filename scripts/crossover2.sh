#!/bin/bash
# Supplementary crossover cells (round 20, pass 2) — run after
# scripts/crossover.sh has generated target/xover/tier_* :
#   * all three POINT cells on the LongArenaMap serving structure
#     (pass 1's HashMap folds OOM'd the 1.8 GB tier at 16g — the arena
#     map is ~3x raw tier bytes, object-free)
#   * cold-scan cells with per-tier (limit, heap) chosen so
#     limit - peak RSS << tier bytes (pass 1's fixed 8 GiB limit left
#     ~5 GiB of slack — the 1.8 GB tier re-warmed mid-cell — and its
#     6g heap OOM'd the 7.1 GB scan)
#   * warm-scan cells with a priming run so the median is the stable
#     memory-bandwidth number (pass 1's 7.1 GB warm cell was still
#     absorbing the tier: 5.0 -> 1.5 s inside the cell)
#   * the point-path keysweep (O(batch-keys) axis)
set -u
cd /root/repo
OUT="${1:-target/xover/crossover2.log}"
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

echo "== warm (primed, 7 runs) ==" | tee -a "$OUT"
cgrun warm $((110*G)) 8g  scan 32000000  32768 7
cgrun warm $((110*G)) 8g  scan 128000000 32768 7
cgrun warm $((110*G)) 12g scan 512000000 32768 7

echo "== cold (limit - RSS << tier) ==" | tee -a "$OUT"
drop; cgrun cold3g  $((4*G))  3g  scan 32000000  32768 5
drop; cgrun cold4g  $((4*G))  3g  scan 128000000 32768 5
drop; cgrun cold14g $((14*G)) 12g scan 512000000 32768 5

echo "== point (arena maps resident; tier uncacheable in limit) ==" | tee -a "$OUT"
drop; cgrun point1 $((8*G))  6g  point 32000000  32768 5
drop; cgrun point2 $((14*G)) 10g point 128000000 32768 5
drop; cgrun point3 $((40*G)) 34g point 512000000 32768 5

echo "== keysweep ==" | tee -a "$OUT"
cgrun point3 $((40*G)) 34g keysweep 512000000 0 5

grep -E "RESULT|build\+probe" "$OUT"
