#!/usr/bin/env bash
# Best-checkpoint (early-stopped) evaluation sweep over every round-5
# model dir: the committed eval_*.json artifacts scored the *final*
# checkpoints (the historical load preference); this re-scores the
# best-validation checkpoints via `evaluate --ckpt best`, writing
# results/r5/eval_best_*.json so RESULTS.md can report the final-vs-best
# gap (the ext150 saturation probe showed the 150-epoch final loses
# ~3.5 dB grid SSNR vs its epoch-29 best-val checkpoint).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

run() { # run <marker> <logfile> <cmd...>
  local mark="results/r5/.done_$1" log="$2"; shift 2
  if [ -f "$mark" ]; then echo "== skip ($mark)"; return 0; fi
  echo "== [$(date +%H:%M:%S)] $* -> $log"
  if "$@" > "$log" 2>&1; then touch "$mark"; else echo "!! failed: $mark"; fi
}

eb() { # eb <name> [env K=V ...]
  local name=$1; shift
  run "eval_best_$name" "results/r5/eval_best_$name.log" env \
      SINCFORMER_MODEL_DIR=saved_models_r5_$name "$@" \
      timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
      --synth-noises multi --ckpt best \
      --json-out results/r5/eval_best_$name.json
}

# flagship first (headline), then the rest
eb v4s0 SINCFORMER_PA_FINE_FEATS=single
eb ext  SINCFORMER_PA_FINE_FEATS=single
eb dcse
eb dnn
eb v5s0 SINCFORMER_PA_FINE_FEATS=dual
eb v4s1 SINCFORMER_PA_FINE_FEATS=single
eb v4s2 SINCFORMER_PA_FINE_FEATS=single
eb v5s1 SINCFORMER_PA_FINE_FEATS=dual
eb v5s2 SINCFORMER_PA_FINE_FEATS=dual
eb msa3 SINCFORMER_MSA_BLOCKS=3

echo "== best-ckpt eval sweep complete"
