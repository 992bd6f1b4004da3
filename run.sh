#!/usr/bin/env bash
# Benchmark sweep driver (reference: run.sh) — per-host prompt slices over
# the official LANTERN operating points (k=10,d=5), (k=5,d=10), (k=5,d=20)
# on MSCOCO-2017-val captions, EAGLE-1 static trees.
#
# Usage: ./run.sh <slice_id> [total_slices] [prompts.json]
# On a multi-host TPU pod, run one slice per host (the engine additionally
# data-parallelises requests across local chips via the (dp, tp) mesh).
set -euo pipefail
cd "$(dirname "$0")"

slice=${1:?usage: run.sh <slice_id> [total_slices] [prompts.json]}
total=${2:-3}
prompts=${3:-data/prompts/captions_val2017_longest.json}
n_prompts=1666
start=$((slice * n_prompts))
end=$(((slice + 1) * n_prompts))

declare -a POINTS=("10 5" "5 10" "5 20")
point=(${POINTS[$((slice % ${#POINTS[@]}))]})
k=${point[0]}
delta=${point[1]}

# SLOTS>1 drives the continuous-batching serving path (BatchedEngine +
# Scheduler); per-request outputs and the stats schema are identical.
SLOTS=${SLOTS:-4}

python main.py generate_images \
    --model-type eagle --static-tree --tree-choices auto \
    --prompts-file "$prompts" --start-idx "$start" --end-idx "$end" \
    --lantern --lantern-k "$k" --lantern-delta "$delta" \
    --seed 42 --slots "$SLOTS" \
    --output-dir "generated_images/coco2017_val/lantern_k_${k}_lambda_${delta}/slice_${slice}" \
    "${@:4}"
