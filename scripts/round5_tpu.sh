#!/usr/bin/env bash
# Round-5 TPU protocol runs (VERDICT r4 #1/#5/#6/#3): the reference's
# multi-noise round-robin training protocol (training/pipeline.py:423-436)
# run for real, 3 seeds x {v4,v5} for error bars, the cross-pipeline
# headline table re-grounded under val protocol 2, the extended-run
# saturation probe on multi-noise data, and the MSA depth lever.
#
# Every artifact lands in results/r5/ and is COMMITTED (VERDICT r4 #2 —
# evidence discipline): train JSONL (per-epoch metrics), eval JSON
# (every per-cell metric value + grand summary), and the stdout logs.
#
# Stages are independently resumable via done-markers; bounded timeouts
# everywhere; never kill by pattern.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5
# persistent XLA compile cache: the 9 runs share 3 architectures, so all
# but the first run of each skips the ~6-10 min tunnel compile
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

run() { # run <marker> <logfile> <cmd...>
  local mark="results/r5/.done_$1" log="$2"; shift 2
  if [ -f "$mark" ]; then echo "== skip ($mark)"; return 0; fi
  echo "== [$(date +%H:%M:%S)] $* -> $log"
  if "$@" > "$log" 2>&1; then touch "$mark"; else echo "!! failed: $mark"; fi
}

# ── metacog train+eval under the multi-noise protocol ──────────────────
mc() { # mc <name> <seed> <fine_feats> <epochs> [extra train args...]
  local name=$1 seed=$2 ff=$3 ep=$4; shift 4
  run "train_$name" "results/r5/train_$name.log" env \
      SINCFORMER_MODEL_DIR=saved_models_r5_$name \
      SINCFORMER_PA_FINE_FEATS=$ff \
      timeout 10800 python -m sincformer_tpu.cli train --pipeline agents \
      --synthetic 64 --epochs "$ep" --adversarial --synth-noises multi \
      --seed "$seed" --log-jsonl results/r5/train_$name.jsonl "$@"
  run "eval_$name" "results/r5/eval_$name.log" env \
      SINCFORMER_MODEL_DIR=saved_models_r5_$name \
      SINCFORMER_PA_FINE_FEATS=$ff \
      timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
      --synth-noises multi --json-out results/r5/eval_$name.json
}

# 1. headline columns first: v4/v5 seed-0, DCSE, DNN
mc v4s0 0 single 50

mc v5s0 0 dual 50

run train_dcse results/r5/train_dcse.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dcse \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline dcse \
    --synthetic 64 --epochs 40 --synth-noises multi --seed 0 \
    --log-jsonl results/r5/train_dcse.jsonl
run eval_dcse results/r5/eval_dcse.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dcse \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
    --synth-noises multi --json-out results/r5/eval_dcse.json

run train_dnn results/r5/train_dnn.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dnn \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline dnn \
    --mask-type pcirm --synthetic 64 --synth-noises multi --seed 0 \
    --log-jsonl results/r5/train_dnn.jsonl
run eval_dnn results/r5/eval_dnn.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dnn \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
    --synth-noises multi --json-out results/r5/eval_dnn.json

# 2. error bars (VERDICT #5): two more seeds per PA variant
mc v4s1 1 single 50
mc v5s1 1 dual 50
mc v4s2 2 single 50
mc v5s2 2 dual 50

# 3. saturation probe (VERDICT #6): does multi-noise data move the
#    early-saturation point? Resume the v4 seed-0 run to 150 epochs in a
#    COPY (the 50-epoch headline checkpoint must survive untouched).
if [ ! -d saved_models_r5_ext ] && [ -d saved_models_r5_v4s0 ]; then
  cp -r saved_models_r5_v4s0 saved_models_r5_ext
fi
run train_ext150 results/r5/train_ext150.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_ext \
    timeout 21600 python -m sincformer_tpu.cli train --pipeline agents \
    --synthetic 64 --epochs 150 --resume --adversarial \
    --synth-noises multi --seed 0 \
    --log-jsonl results/r5/train_ext150.jsonl
run eval_ext150 results/r5/eval_ext150.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_ext \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
    --synth-noises multi --json-out results/r5/eval_ext150.json

# 4. MSA depth lever (VERDICT #3): 3 blocks instead of the shipped 4,
#    full 50-epoch protocol (quality price of the inference speedup)
run train_msa3 results/r5/train_msa3.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_msa3 \
    SINCFORMER_MSA_BLOCKS=3 \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline agents \
    --synthetic 64 --epochs 50 --adversarial --synth-noises multi \
    --seed 0 --log-jsonl results/r5/train_msa3.jsonl
run eval_msa3 results/r5/eval_msa3.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_msa3 \
    SINCFORMER_MSA_BLOCKS=3 \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
    --synth-noises multi --json-out results/r5/eval_msa3.json

echo "== [$(date +%H:%M:%S)] round5 protocol queue complete"
