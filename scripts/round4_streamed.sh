#!/bin/bash
cd /root/repo
echo "=== streamed 2^20 chunk 2^19 (overhead vs resident 8.34s) ==="
timeout 2400 python -u scripts/e2e_large.py --log-domain 20 --streamed $((1<<19)) --repeats 2
echo "=== streamed 2^22 chunk 2^20 (at-scale peak evidence) ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<20)) --repeats 2
echo DONE
