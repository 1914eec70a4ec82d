#!/usr/bin/env bash
# 100 Mb-class reference oracle run (single-threaded = parity mode).
# Same dataset as run_smoke.sh (100 Mb genome, 25x, seed 99, 10M reads).
# Detached long-runner; restartable — the reference resumes from its own
# checkpoint files (_CheckpointInfo.txt / _parGraph chunks / _startRead,
# src/BuildGraph/src/OverlapGraph.cpp:123-192) when re-run with the same
# command. Writes BUILDG_DONE / DONE markers.
set -euo pipefail
cd /root/repo/scale100

if [ ! -s reads.fasta ]; then
  echo "reads.fasta missing — generate with run_smoke.sh first" >&2
  exit 1
fi
echo "MinOverlap4BuildGraph = 40" > b.cfg

run_timed () {  # name cmd...
  local name=$1; shift
  local t0=$SECONDS
  "$@" > "$name.log" 2>&1 &
  local pid=$!
  local peak=0
  while kill -0 $pid 2>/dev/null; do
    local rss
    rss=$(awk '/VmRSS/{print $2}' /proc/$pid/status 2>/dev/null || echo 0)
    [ "${rss:-0}" -gt "$peak" ] && peak=$rss
    sleep 5
  done
  wait $pid
  local rc=$?
  echo "$name wall_s=$((SECONDS-t0)) peak_rss_kb=$peak rc=$rc" >> timings_oracle.txt
  return $rc
}

if [ ! -f BUILDG_DONE ]; then
  run_timed ref_buildg /root/repo/refbuild/buildG -pe reads.fasta -f REF -p b.cfg -t 1 -m 48
  touch BUILDG_DONE
fi
run_timed ref_fullsimplify /root/repo/refbuild/fullsimplify -fpi reads.fasta \
  -e REF_0_parGraph.txt -crd REF_0_containedReads.txt \
  -simPth /root/repo/refbuild -p /root/reference/disco.cfg \
  -p2 /root/reference/disco_2.cfg -p3 /root/reference/disco_3.cfg \
  -o REFS -t 1 -log INFO
touch DONE
