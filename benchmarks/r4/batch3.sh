#!/bin/bash
cd /root/repo
echo "=== 3b q8 q8v3-default (fair A/B vs no-v3 1216.9) ==="
timeout 2400 python bench.py --size 3b --quant q8_0 --decode-only 2>benchmarks/r4/b3_3b_q8v3.log; tail -1 benchmarks/r4/b3_3b_q8v3.log
echo "=== 1b-tp4shard batch 32 (fixed-cost amortization) ==="
timeout 2400 python bench.py --size 1b-tp4shard --batch 32 --decode-only 2>benchmarks/r4/b3_shard_b32.log; tail -1 benchmarks/r4/b3_shard_b32.log
echo "=== 1b longctx rerun (new kernels) ==="
timeout 2400 python bench.py --size 1b --seq 4096 --fill-pos 3500 --decode-only 2>benchmarks/r4/b3_longctx.log; tail -1 benchmarks/r4/b3_longctx.log
echo "=== 1b full (TTFT + prefill MFU at HEAD) ==="
timeout 2400 python bench.py --size 1b 2>benchmarks/r4/b3_1b_full.log; tail -1 benchmarks/r4/b3_1b_full.log
echo DONE
