#!/bin/bash
cd /root/repo
for cfg in "--size 1b --quant q4" "--size 3b --quant q8_0" "--size 8b --quant q4"; do
  echo "### $cfg"
  timeout 1200 python bench.py $cfg --batch 8 --decode-tokens 256 2>&1 | grep -E "decode:|prefill|params|{\""
done
