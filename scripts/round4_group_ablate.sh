#!/bin/bash
cd /root/repo
for g in 4 2 5 1; do
  echo "=== group=$g ==="
  CIRCOM_TPU_MSM_GROUP=$g timeout 1200 python bench.py --log-n 20 --repeats 3
done
echo "=== g2 group=4 ==="
CIRCOM_TPU_MSM_GROUP=4 timeout 1200 python bench.py --log-n 20 --curve g2 --repeats 3
echo "=== g2 group=2 ==="
CIRCOM_TPU_MSM_GROUP=2 timeout 1200 python bench.py --log-n 20 --curve g2 --repeats 3
echo DONE
