#!/bin/bash
# Round-5 measurement chain (VERDICT r4 tasks 1 + 2), restartable: each
# step is skipped if its DONE marker exists. Keys build in their own
# processes (device memory freed before the prove runs). Logs land in
# .cache/ and are copied to measurements/round5/ by the session.
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

step streamed20 2400 python -u scripts/e2e_large.py --log-domain 20 \
  --streamed $((1<<19)) --repeats 3

step key22 3600 python -u scripts/e2e_large.py --log-domain 22 --key-only
step streamed22 3600 python -u scripts/e2e_large.py --log-domain 22 \
  --streamed $((1<<20)) --repeats 3

step key23 7200 python -u scripts/e2e_large.py --log-domain 23 --key-only
step streamed23 3600 python -u scripts/e2e_large.py --log-domain 23 \
  --streamed $((1<<20)) --repeats 2

step key24 10800 python -u scripts/e2e_large.py --log-domain 24 --key-only
step streamed24 7200 python -u scripts/e2e_large.py --log-domain 24 \
  --streamed $((1<<20)) --repeats 1

# resident 2^20 re-certification on the packed core (fresh evidence for
# the 7.47 s BASELINE row) — last: the number already exists in BASELINE
step e2e20 2400 python -u scripts/e2e_large.py --log-domain 20 --repeats 3

mark ALL_DONE
