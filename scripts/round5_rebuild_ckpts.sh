#!/usr/bin/env bash
# Regenerate the round-5 checkpoints that were lost to a machine recycle
# between builder sessions (saved_models_r5_* were untracked; the committed
# results/r5/*.json|jsonl artifacts survive). Training is deterministic
# (fixed --seed, synthetic corpus), so these reproduce the same runs as
# scripts/round5_tpu.sh. Logs go to /tmp so the committed round-5 train
# artifacts are NOT overwritten; determinism is verified separately by
# re-running one final-ckpt eval and diffing against the committed JSON.
#
# Targets: the four models whose best-ckpt evals were still pending
# (v4s2, v5s1, v5s2, msa3) plus the flagship v4s0 (to commit a durable
# best checkpoint as in-repo evidence).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
mkdir -p /tmp/r5_rebuild

run() { # run <marker> <logfile> <cmd...>
  local mark="/tmp/r5_rebuild/.done_$1" log="$2"; shift 2
  if [ -f "$mark" ]; then echo "== skip ($mark)"; return 0; fi
  echo "== [$(date +%H:%M:%S)] $* -> $log"
  if "$@" > "$log" 2>&1; then touch "$mark"; else echo "!! failed: $mark"; fi
}

mc() { # mc <name> <seed> <fine_feats> [env extras...]
  local name=$1 seed=$2 ff=$3; shift 3
  if [ -d "saved_models_r5_$name" ]; then echo "== have saved_models_r5_$name"; return 0; fi
  run "train_$name" "/tmp/r5_rebuild/train_$name.log" env \
      SINCFORMER_MODEL_DIR=saved_models_r5_$name \
      SINCFORMER_PA_FINE_FEATS=$ff "$@" \
      timeout 10800 python -m sincformer_tpu.cli train --pipeline agents \
      --synthetic 64 --epochs 50 --adversarial --synth-noises multi \
      --seed "$seed" --log-jsonl /tmp/r5_rebuild/train_$name.jsonl
}

mc v4s0 0 single
mc v4s2 2 single
mc v5s1 1 dual
mc v5s2 2 dual
mc msa3 0 single SINCFORMER_MSA_BLOCKS=3

# determinism witness: re-evaluate the rebuilt v4s0 FINAL checkpoint and
# compare against the committed results/r5/eval_v4s0.json
run "eval_check_v4s0" "/tmp/r5_rebuild/eval_check_v4s0.log" env \
    SINCFORMER_MODEL_DIR=saved_models_r5_v4s0 \
    SINCFORMER_PA_FINE_FEATS=single \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
    --synth-noises multi --json-out /tmp/r5_rebuild/eval_check_v4s0.json

echo "== [$(date +%H:%M:%S)] rebuild complete"
