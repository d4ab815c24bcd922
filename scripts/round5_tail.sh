#!/bin/bash
# Round-5 tail: re-measure streamed 2^22/2^20 on the restored overlapped
# schedule + packed host staging (the schedule change is host-only, so
# the 2^22 fused graph hits the persistent compile cache).
cd /root/repo
mark() { echo "$(date -u +%FT%TZ) $1" >> .cache/round5_chain.status; }

step() { # step NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  if [ -f ".cache/done_$name" ]; then mark "skip $name"; return 0; fi
  mark "start $name"
  if timeout "$tmo" "$@" > ".cache/round5_$name.log" 2>&1; then
    touch ".cache/done_$name"; mark "done $name"
  else
    mark "FAIL $name rc=$?"
  fi
}

step streamed22b 1800 python -u scripts/e2e_large.py --log-domain 22 \
  --streamed $((1<<20)) --repeats 3
step streamed20b 1500 python -u scripts/e2e_large.py --log-domain 20 \
  --streamed $((1<<19)) --repeats 3
mark TAIL_DONE
