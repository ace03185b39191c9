#!/bin/bash
cd /root/repo
echo "=== 1b long-prompt prefill MFU retry (2x2048, row-chunked kernels) ==="
timeout 3000 python bench.py --size 1b --prompt 2048 --batch 2 --seq 4096 --decode-tokens 32 --chunk 32 2>benchmarks/r4/b5_prefill2k.log; tail -1 benchmarks/r4/b5_prefill2k.log
echo "=== 8b decode with forced 512,512 v3 tiles (wqkv/wo A/B) ==="
NFAI_V3_TILES=512,512 timeout 3000 python bench.py --size 8b --decode-only 2>benchmarks/r4/b5_8b_tiles.log; tail -1 benchmarks/r4/b5_8b_tiles.log
echo DONE
