#!/usr/bin/env bash
# Round-5c: extend the speech-diversity probe (RESULTS.md round-5
# finding #8).
#
#   vd1024      — flagship v4, 1024 varied utterances, 50 epochs: third
#                 point on the corpus-size scaling curve (64 -> 256 ->
#                 1024; 64->256 moved every metric).
#   dcse_vd256  — DCSE on 256 varied utterances: matched cross-pipeline
#                 control at the larger corpus size (the 64-utt control
#                 lost 4/5 metrics to the flagship).
#   eval_best_* — best-val-checkpoint scores for every varied-trained
#                 model (the final-vs-best convention of
#                 round5_best_evals.sh, on the VARIED grid).
#
# All runs use the multi-noise protocol (val protocol 2 + calibration).
# Markers under results/r5/.done_* make the queue resumable.
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

tr_agents() { # tr_agents <name> <n_utts> <epochs>
  local name=$1 n=$2 ep=$3
  run "train_$name" "results/r5/train_$name.log" env \
      SINCFORMER_MODEL_DIR=saved_models_r5_$name \
      SINCFORMER_PA_FINE_FEATS=single \
      timeout 10800 python -m sincformer_tpu.cli train --pipeline agents \
      --synthetic "$n" --epochs "$ep" --adversarial --synth-noises multi \
      --synth-speech varied --seed 0 \
      --log-jsonl results/r5/train_$name.jsonl
}

ev() { # ev <marker> <model_dir> <out> [extra cli args...]
  local mark=$1 dir=$2 out=$3; shift 3
  run "$mark" "results/r5/$mark.log" env \
      SINCFORMER_MODEL_DIR=$dir SINCFORMER_PA_FINE_FEATS=single \
      timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
      --synth-noises multi --synth-speech varied "$@" \
      --json-out "results/r5/$out.json"
}

# 1. scaling curve, third point
tr_agents vd1024 1024 50
ev eval_vd1024_varied saved_models_r5_vd1024 eval_vd1024_varied

# 2. matched DCSE control at 256
run train_dcse_vd256 results/r5/train_dcse_vd256.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dcse_vd256 \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline dcse \
    --synthetic 256 --epochs 40 --synth-noises multi \
    --synth-speech varied --seed 0 \
    --log-jsonl results/r5/train_dcse_vd256.jsonl
ev eval_dcse_vd256 saved_models_r5_dcse_vd256 eval_dcse_vd256

# 3. best-val checkpoints of every varied-trained model, varied grid
ev eval_best_vd64        saved_models_r5_vd64        eval_best_vd64        --ckpt best
ev eval_best_vd256       saved_models_r5_vd256       eval_best_vd256       --ckpt best
ev eval_best_vd1024      saved_models_r5_vd1024      eval_best_vd1024      --ckpt best
ev eval_best_dcse_vd     saved_models_r5_dcse_vd     eval_best_dcse_vd     --ckpt best
ev eval_best_dcse_vd256  saved_models_r5_dcse_vd256  eval_best_dcse_vd256  --ckpt best

echo "== [$(date +%H:%M:%S)] round5c scaling queue complete"
