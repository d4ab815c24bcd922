#!/bin/bash
cd /root/repo
echo "=== STREAMED 2^22 chunk 2^19, 10.5GB filler AFTER warmup (forcing) ==="
timeout 3600 python -u scripts/e2e_large.py --log-domain 22 --streamed $((1<<19)) --repeats 2 --hbm-filler-gb 10.5 --filler-after-warmup || echo "STREAMED-CAPPED FAILED rc=$?"
echo "=== ablate_streamed 2^20 chunk 2^19 ==="
timeout 2400 python -u scripts/ablate_streamed.py --log-domain 20 --chunk $((1<<19)) || echo "ABLATE FAILED rc=$?"
echo "=== compile cache probe (run 1) ==="
timeout 900 python scripts/probe_compile_cache.py 2>/tmp/cache_probe1.err | tail -8
echo "=== compile cache probe (run 2) ==="
timeout 900 python scripts/probe_compile_cache.py 2>/tmp/cache_probe2.err | tail -8
echo DONE
