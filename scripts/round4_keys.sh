#!/bin/bash
# Round-4 warmup: regenerate wiped .cache fixtures + re-certify the 2^20 baseline.
set -x
cd /root/repo
python -u scripts/e2e_large.py --log-domain 20 > .cache/round4_e2e20_baseline.log 2>&1
python -u scripts/e2e_large.py --log-domain 22 --key-only > .cache/round4_key22.log 2>&1
echo DONE_ALL
