#!/bin/bash
cd /root/repo
echo "=== 2^23 device setup (first ever at this size) ==="
timeout 7200 python -u scripts/e2e_large.py --log-domain 23 --key-only || { echo "SETUP FAILED rc=$?"; exit 1; }
echo "=== streamed 2^23 chunk 2^19 ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 23 --streamed $((1<<19)) --repeats 2 || echo "STREAMED 2^23 FAILED rc=$?"
echo DONE
