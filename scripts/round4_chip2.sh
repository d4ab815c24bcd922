#!/bin/bash
cd /root/repo
echo "=== g2 w14 ==="
timeout 1300 python bench.py --log-n 20 --curve g2 --window-bits 14 --repeats 5
echo "=== g2 w15 ==="
timeout 1300 python bench.py --log-n 20 --curve g2 --window-bits 15 --repeats 5
echo "=== g2 w13 (clean baseline, reps5) ==="
timeout 1300 python bench.py --log-n 20 --curve g2 --window-bits 13 --repeats 5
echo "=== g1 group=2 reps5 (final grouped verdict) ==="
CIRCOM_TPU_MSM_GROUP=2 timeout 1300 python bench.py --log-n 20 --repeats 5
echo DONE
