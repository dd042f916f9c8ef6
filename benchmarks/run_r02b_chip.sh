#!/bin/bash
# Round-2 continuation chip sweeps (run sequentially; one chip).
# Usage: setsid nohup bash benchmarks/run_r02b_chip.sh > runs/r02b_chip.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# int8 vs bf16 inference (resnet18)
python benchmarks/sweep.py --nets resnet_18 --batches 128,512 --int8 \
  >> benchmarks/sweep_r02_int8.jsonl

# hourglass inference rows (missing from the r02 sweep)
python benchmarks/sweep.py --nets hourglass_1 --batches 32,128,512 \
  >> benchmarks/sweep_r02_decode.jsonl

# sustained (chained) train steps, both nets
python benchmarks/sweep.py --nets resnet_18,hourglass_1 --batches 32,128 \
  --train-chained --skip-infer >> benchmarks/train_step_r02.jsonl

# headline
python bench.py > /tmp/bench_r02b.json 2> /tmp/bench_r02b.err
cat /tmp/bench_r02b.json
echo DONE
