#!/bin/bash
# Round-5 streamed prover measurements (VERDICT r4 tasks 1 + 2).
# Run AFTER the 2^24 setup finishes (the chip must be uncontended).
# Targets: 2^20 <= 11 s, 2^22 <= 45 s, 2^23 <= 180 s, all verified;
# then the first-ever 2^24 streamed prove.
set -x
cd /root/repo
python -u scripts/e2e_large.py --log-domain 20 --streamed $((1<<19)) --repeats 3 \
  > .cache/round5_streamed20.log 2>&1
python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<20)) --repeats 3 \
  > .cache/round5_streamed22.log 2>&1
python -u scripts/e2e_large.py --log-domain 23 --streamed $((1<<20)) --repeats 2 \
  > .cache/round5_streamed23.log 2>&1
echo DONE_STREAMED_SMALL > .cache/round5_streamed_done
python -u scripts/e2e_large.py --log-domain 24 --streamed $((1<<20)) --repeats 1 \
  > .cache/round5_streamed24.log 2>&1
echo DONE_ALL > .cache/round5_streamed24_done
