#!/bin/bash
cd /root/repo
echo "=== wqkv anatomy (mins cost at the 2x-ratio shape) ==="
NFAI_ANATOMY_WQKV=1 NFAI_ANATOMY=full,full+mins,noscale,noscale+mins timeout 3000 python benchmarks/qmm_probe_8b.py --skip-mlp --skip-head > benchmarks/r4/b4_wqkv_anatomy.log 2>&1
grep -E "anatomy" benchmarks/r4/b4_wqkv_anatomy.log
echo "=== 1b long-prompt prefill MFU (2x2048) ==="
timeout 3000 python bench.py --size 1b --prompt 2048 --batch 2 --seq 4096 --decode-tokens 32 --chunk 32 2>benchmarks/r4/b4_prefill2k.log; tail -1 benchmarks/r4/b4_prefill2k.log
echo DONE
