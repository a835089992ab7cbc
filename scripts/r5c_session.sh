#!/usr/bin/env bash
# Round-5c session queue: the machine recycled between builder sessions
# again (saved_models_r5_* untracked dirs wiped), so this wrapper runs the
# round5c_scaling.sh work in PRIORITY order — new measurements first, then
# checkpoint rebuilds (training is deterministic: fixed seed + synthetic
# corpus, same convention as scripts/round5_rebuild_ckpts.sh) so the
# best-ckpt evals of the earlier varied-speech models can still run.
#
# Rebuild train logs go to /tmp so the committed results/r5/train_vd*.jsonl
# artifacts from the original runs are NOT overwritten.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5 /tmp/r5_rebuild
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

run() { # run <marker> <logfile> <cmd...>
  local mark="results/r5/.done_$1" log="$2"; shift 2
  if [ -f "$mark" ]; then echo "== skip ($mark)"; return 0; fi
  echo "== [$(date +%H:%M:%S)] $* -> $log"
  if "$@" > "$log" 2>&1; then touch "$mark"; else echo "!! failed: $mark"; fi
}

rerun() { # rerun <marker> <logfile> <cmd...>  (marker in /tmp: rebuild-only)
  local mark="/tmp/r5_rebuild/.done_$1" log="$2"; shift 2
  if [ -f "$mark" ]; then echo "== skip ($mark)"; return 0; fi
  echo "== [$(date +%H:%M:%S)] $* -> $log"
  if "$@" > "$log" 2>&1; then touch "$mark"; else echo "!! failed: $mark"; fi
}

ev() { # ev <marker> <model_dir> <out> [extra cli args...]
  local mark=$1 dir=$2 out=$3; shift 3
  run "$mark" "results/r5/$mark.log" env \
      SINCFORMER_MODEL_DIR=$dir SINCFORMER_PA_FINE_FEATS=single \
      timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
      --synth-noises multi --synth-speech varied "$@" \
      --json-out "results/r5/$out.json"
}

# ---- 1. NEW science: scaling-curve third point (vd1024) ----
run train_vd1024 results/r5/train_vd1024.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_vd1024 \
    SINCFORMER_PA_FINE_FEATS=single \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline agents \
    --synthetic 1024 --epochs 50 --adversarial --synth-noises multi \
    --synth-speech varied --seed 0 \
    --log-jsonl results/r5/train_vd1024.jsonl
ev eval_vd1024_varied   saved_models_r5_vd1024 eval_vd1024_varied
ev eval_best_vd1024     saved_models_r5_vd1024 eval_best_vd1024 --ckpt best

# ---- 2. NEW science: matched DCSE control at 256 varied utterances ----
run train_dcse_vd256 results/r5/train_dcse_vd256.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dcse_vd256 \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline dcse \
    --synthetic 256 --epochs 40 --synth-noises multi \
    --synth-speech varied --seed 0 \
    --log-jsonl results/r5/train_dcse_vd256.jsonl
ev eval_dcse_vd256      saved_models_r5_dcse_vd256 eval_dcse_vd256
ev eval_best_dcse_vd256 saved_models_r5_dcse_vd256 eval_best_dcse_vd256 --ckpt best

# ---- 3. Rebuild wiped varied-speech checkpoints, then best-ckpt evals ----
rb_agents() { # rb_agents <name> <n_utts>
  local name=$1 n=$2
  [ -d "saved_models_r5_$name" ] && { echo "== have saved_models_r5_$name"; return 0; }
  rerun "train_$name" "/tmp/r5_rebuild/train_$name.log" env \
      SINCFORMER_MODEL_DIR=saved_models_r5_$name \
      SINCFORMER_PA_FINE_FEATS=single \
      timeout 10800 python -m sincformer_tpu.cli train --pipeline agents \
      --synthetic "$n" --epochs 50 --adversarial --synth-noises multi \
      --synth-speech varied --seed 0 \
      --log-jsonl /tmp/r5_rebuild/train_$name.jsonl
}

rb_agents vd64 64
ev eval_best_vd64 saved_models_r5_vd64 eval_best_vd64 --ckpt best

rb_agents vd256 256
ev eval_best_vd256 saved_models_r5_vd256 eval_best_vd256 --ckpt best

[ -d saved_models_r5_dcse_vd ] || rerun train_dcse_vd /tmp/r5_rebuild/train_dcse_vd.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dcse_vd \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline dcse \
    --synthetic 64 --epochs 40 --synth-noises multi \
    --synth-speech varied --seed 0 \
    --log-jsonl /tmp/r5_rebuild/train_dcse_vd.jsonl
ev eval_best_dcse_vd saved_models_r5_dcse_vd eval_best_dcse_vd --ckpt best

echo "== [$(date +%H:%M:%S)] r5c session queue complete"
