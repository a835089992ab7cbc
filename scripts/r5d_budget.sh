#!/usr/bin/env bash
# Round-5d: test the "vd1024 is epoch-budget-limited" claim (RESULTS.md
# round-5 finding #8b). Resume BOTH varied-speech scaling points to 100
# epochs under identical settings and re-score the shared held-out varied
# grid. If vd1024@100 overtakes vd256@100 on STOI, diversity scaling is
# monotonic given budget; if not, 256 utterances is a genuine optimum.
#
# Extension logs use *_e100 names so the committed 0-49 artifacts
# (results/r5/train_vd{256,1024}.jsonl) are preserved.
#
# The axon tunnel occasionally drops a remote_compile response mid-run
# (transient INTERNAL error), so training steps retry up to 3 times —
# --resume restores the newest full train state, making retry safe — and
# each eval runs ONLY if its train marker exists (first launch of this
# queue scored a stale checkpoint after a tunnel drop; scrubbed).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

run() { # run <marker> <attempts> <logfile> <cmd...>
  local mark="results/r5/.done_$1" tries="$2" log="$3"; shift 3
  if [ -f "$mark" ]; then echo "== skip ($mark)"; return 0; fi
  local i
  for i in $(seq 1 "$tries"); do
    echo "== [$(date +%H:%M:%S)] (try $i/$tries) $* -> $log"
    if "$@" >> "$log" 2>&1; then touch "$mark"; return 0; fi
    echo "!! attempt $i failed: $mark"
    sleep 20
  done
  return 1
}

for sz in 1024 256; do
  run "train_vd${sz}_e100" 3 "results/r5/train_vd${sz}_e100.log" \
    env SINCFORMER_MODEL_DIR="saved_models_r5_vd${sz}" \
        SINCFORMER_PA_FINE_FEATS=single \
    timeout 10800 python -m sincformer_tpu.cli train --pipeline agents \
      --synthetic "$sz" --epochs 100 --resume --adversarial \
      --synth-noises multi --synth-speech varied --seed 0 \
      --log-jsonl "results/r5/train_vd${sz}_e100.jsonl" \
  || { echo "!! train_vd${sz}_e100 exhausted retries; skipping its evals"; continue; }

  run "eval_vd${sz}_e100" 2 "results/r5/eval_vd${sz}_e100.log" \
    env SINCFORMER_MODEL_DIR="saved_models_r5_vd${sz}" \
        SINCFORMER_PA_FINE_FEATS=single \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
      --synth-noises multi --synth-speech varied \
      --json-out "results/r5/eval_vd${sz}_e100.json"

  run "eval_best_vd${sz}_e100" 2 "results/r5/eval_best_vd${sz}_e100.log" \
    env SINCFORMER_MODEL_DIR="saved_models_r5_vd${sz}" \
        SINCFORMER_PA_FINE_FEATS=single \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
      --synth-noises multi --synth-speech varied --ckpt best \
      --json-out "results/r5/eval_best_vd${sz}_e100.json"
done
echo "== [$(date +%H:%M:%S)] r5d budget-extension queue complete"
