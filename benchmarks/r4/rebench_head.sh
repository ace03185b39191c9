#!/bin/bash
# Re-measure every ledger row at HEAD (VERDICT r3 item 2/3).
cd /root/repo
out=benchmarks/r4
run() {
  name=$1; shift
  echo "=== $name: $* ===" 
  timeout 1800 python bench.py "$@" >"$out/$name.json" 2>"$out/$name.log"
  echo "rc=$? $(cat $out/$name.json 2>/dev/null)"
}
run head_1b_q4 --size 1b
run head_3b_q8 --size 3b --quant q8_0
run head_8b_q4 --size 8b
run head_8b_tp4shard --size 8b-tp4shard
run head_1b_q4_longctx --size 1b --seq 4096 --fill-pos 3500 --decode-only
echo ALL DONE
