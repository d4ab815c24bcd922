#!/bin/bash
cd /root/repo
echo "=== profile_streamed 2^20 chunk 2^19 ==="
timeout 2400 python -u scripts/profile_streamed.py --log-domain 20 --chunk $((1<<19)) || echo "PROFILE FAILED rc=$?"
echo "=== RESIDENT 2^22 + 10GB filler (expect OOM - forcing evidence) ==="
timeout 2400 python -u scripts/e2e_large.py --log-domain 22 --repeats 1 --hbm-filler-gb 10 && echo "RESIDENT SURVIVED (unexpected)" || echo "RESIDENT FAILED under 10GB filler rc=$? (expected)"
echo "=== STREAMED 2^22 chunk 2^19 + 10GB filler (expect verified) ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<19)) --repeats 1 --hbm-filler-gb 10 || echo "STREAMED FAILED rc=$?"
echo DONE
