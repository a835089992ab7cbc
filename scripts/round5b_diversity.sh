#!/usr/bin/env bash
# Round-5b: the speech-diversity probe (RESULTS.md round-5 finding #4
# said the binding constraint after noise diversity is SPEECH diversity —
# the corpus was N scaled crops of one fixed formant pattern).
#
# Runs, all under the multi-noise protocol (val protocol 2 + calibration):
#   vd64   — flagship v4, 64 *varied* utterances, 50 epochs
#   dcse_vd— DCSE on the same varied corpus (cross-pipeline control)
#   vd256  — flagship v4, 256 varied utterances (corpus-size scaling)
# Evals:
#   each model on the VARIED grid (held-out utterance seeds 500k+), and
#   vd64 + the formant-trained v4s0 cross-evaluated on the other corpus
#   (generalization gap / single-pattern memorization exposure).
#
# Scores on the varied grid are NOT comparable to the formant grid —
# they form their own table. Artifacts committed under results/r5/.
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

ev() { # ev <marker> <model_dir> <speech_kind> <out> [env extras...]
  local mark=$1 dir=$2 sp=$3 out=$4; shift 4
  run "$mark" "results/r5/$mark.log" env \
      SINCFORMER_MODEL_DIR=$dir SINCFORMER_PA_FINE_FEATS=single "$@" \
      timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
      --synth-noises multi --synth-speech "$sp" \
      --json-out "results/r5/$out.json"
}

# 1. flagship on the diverse corpus
tr_agents vd64 64 50
ev eval_vd64_varied  saved_models_r5_vd64 varied  eval_vd64_varied
ev eval_vd64_formant saved_models_r5_vd64 formant eval_vd64_formant

# 2. the formant-trained flagship cross-evaluated on varied speech
#    (requires saved_models_r5_v4s0 — rebuilt by round5_rebuild_ckpts.sh)
if [ -d saved_models_r5_v4s0 ]; then
  ev eval_v4s0_varied saved_models_r5_v4s0 varied eval_v4s0_varied
fi

# 3. DCSE control on the same corpus
run train_dcse_vd results/r5/train_dcse_vd.log env \
    SINCFORMER_MODEL_DIR=saved_models_r5_dcse_vd \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline dcse \
    --synthetic 64 --epochs 40 --synth-noises multi --synth-speech varied \
    --seed 0 --log-jsonl results/r5/train_dcse_vd.jsonl
ev eval_dcse_vd saved_models_r5_dcse_vd varied eval_dcse_vd

# 4. corpus-size scaling: 4x utterances, same protocol
tr_agents vd256 256 50
ev eval_vd256_varied saved_models_r5_vd256 varied eval_vd256_varied

echo "== [$(date +%H:%M:%S)] round5b diversity queue complete"
