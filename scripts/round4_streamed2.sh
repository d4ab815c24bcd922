#!/bin/bash
cd /root/repo
echo "=== NEW fused streamed 2^20 chunk 2^19 ==="
timeout 2400 python -u scripts/e2e_large.py --log-domain 20 --streamed $((1<<19)) --repeats 2
echo "=== NEW fused streamed 2^22 chunk 2^20 ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<20)) --repeats 2
echo "=== NEW fused streamed 2^22 chunk 2^19 + 11GB HBM filler (forcing) ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<19)) --repeats 2 --hbm-filler-gb 11
echo DONE
