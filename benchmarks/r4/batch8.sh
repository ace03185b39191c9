#!/bin/bash
cd /root/repo
for cfg in "512 512" "256 1024" "512 1024"; do
  set -- $cfg
  echo "=== prefill blocks tb=$1 sb=$2 ==="
  NFAI_PREFILL_TB=$1 NFAI_PREFILL_SB=$2 timeout 2400 python bench.py --size 1b --prompt 2048 --batch 2 --seq 4096 --decode-tokens 32 --chunk 32 2>&1 | grep -E "prefill\(|ttft"
done
echo DONE
