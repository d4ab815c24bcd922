#!/bin/bash
cd /root/repo
echo "=== RESIDENT 2^22 + 9GB filler (expect OOM) ==="
timeout 2400 python -u scripts/e2e_large.py --log-domain 22 --repeats 1 --hbm-filler-gb 9 && echo "RESIDENT SURVIVED 9GB filler" || echo "RESIDENT FAILED under 9GB filler rc=$? (expected)"
echo "=== STREAMED 2^22 chunk 2^18 + 9GB filler after warmup (expect verified) ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<18)) --repeats 2 --hbm-filler-gb 9 --filler-after-warmup || echo "STREAMED FAILED rc=$?"
echo DONE
