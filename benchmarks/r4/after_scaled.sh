#!/bin/bash
cd /root/repo
echo "=== kernel parity on TPU ==="
timeout 2400 python benchmarks/tpu_kernel_parity.py 2>&1 | grep -vE "WARNING" | tail -25
echo "=== 1b q4 decode-only ==="
timeout 2400 python bench.py --size 1b --decode-only 2>benchmarks/r4/after_1b.log; tail -2 benchmarks/r4/after_1b.log
echo "=== 8b q4 decode-only ==="
timeout 3000 python bench.py --size 8b --decode-only 2>benchmarks/r4/after_8b.log; tail -2 benchmarks/r4/after_8b.log
echo DONE
