#!/bin/bash
cd /root/repo
echo "=== device-scalar streamed 2^20 chunk 2^19 ==="
timeout 2400 python -u scripts/e2e_large.py --log-domain 20 --streamed $((1<<19)) --repeats 3 || echo "FAILED rc=$?"
echo "=== ablate_streamed 2^20 chunk 2^19 (new design) ==="
timeout 2400 python -u scripts/ablate_streamed.py --log-domain 20 --chunk $((1<<19)) || echo "ABLATE FAILED rc=$?"
echo "=== device-scalar streamed 2^22 chunk 2^20 ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<20)) --repeats 2 || echo "FAILED rc=$?"
echo "=== capped: streamed 2^22 chunk 2^18, 10GB filler after warmup ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<18)) --repeats 2 --hbm-filler-gb 10 --filler-after-warmup || echo "CAPPED FAILED rc=$?"
echo DONE
