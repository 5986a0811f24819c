#!/bin/bash
# quietrun.sh <max_attempts> <cmd...> — run cmd in a quiet hypervisor
# window: wait until the 5 s steal rate is < 1 cpu, run, then report the
# steal accumulated DURING the run so a contaminated measurement is
# visible (and can be retried). Exit code is the command's.
attempts=$1; shift
steal() { awk '/^cpu /{print $9}' /proc/stat; }
for i in $(seq 1 "$attempts"); do
  s0=$(steal); sleep 5; s1=$(steal)
  rate=$(( (s1 - s0) / 5 ))   # jiffies/sec; 100 = one stolen cpu
  if [ "$rate" -lt 100 ]; then
    r0=$(steal); t0=$(date +%s)
    "$@"; rc=$?
    r1=$(steal); t1=$(date +%s)
    echo "[quietrun] run_steal_sec=$(( (r1 - r0) / 100 )) wall=$(( t1 - t0 ))s rc=$rc" >&2
    exit $rc
  fi
  echo "[quietrun] attempt $i: steal rate $rate jiffies/s, waiting 30s" >&2
  sleep 30
done
echo "[quietrun] no quiet window after $attempts attempts" >&2
exit 75
