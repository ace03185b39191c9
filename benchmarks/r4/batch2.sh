#!/bin/bash
cd /root/repo
echo "=== 3b q8 NO-v3 (A/B vs 1053.7 with q8v3) ==="
timeout 2400 python bench.py --size 3b --quant q8_0 --no-v3 --decode-only 2>benchmarks/r4/b2_3b_nov3.log; tail -1 benchmarks/r4/b2_3b_nov3.log
echo "=== 1b-tp4shard decode-only (HEAD kernels) ==="
timeout 2400 python bench.py --size 1b-tp4shard --decode-only 2>benchmarks/r4/b2_1bshard.log; tail -1 benchmarks/r4/b2_1bshard.log
echo "=== 8b-tp4shard decode-only (HEAD kernels) ==="
timeout 2400 python bench.py --size 8b-tp4shard --decode-only 2>benchmarks/r4/b2_8bshard.log; tail -1 benchmarks/r4/b2_8bshard.log
echo "=== profile 1b-tp4shard (fixed-cost attribution) ==="
timeout 2400 python benchmarks/profile_decode.py --size 1b-tp4shard > benchmarks/r4/b2_prof_shard.log 2>&1; tail -45 benchmarks/r4/b2_prof_shard.log
echo "=== profile 8b ==="
timeout 3000 python benchmarks/profile_decode.py --size 8b > benchmarks/r4/b2_prof_8b.log 2>&1; tail -45 benchmarks/r4/b2_prof_8b.log
echo DONE
