#!/usr/bin/env bash
# Post-retrain sequence for the flagship v4s0 dir (the machine recycle
# left a PARTIAL rebuild: best family ended at step_175/epoch-24 with the
# true best — step_210/epoch-29 — dead as an .orbax-checkpoint-tmp, so the
# first export shipped the wrong best checkpoint):
#   1. determinism witness — re-evaluate the retrained FINAL checkpoint
#      and require byte-equal summaries vs the committed eval_v4s0.json;
#   2. re-export the serving artifact from the TRUE best (step_210);
#   3. re-score the int8 artifact on the full grid (committed evidence).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export SINCFORMER_PA_FINE_FEATS=single

echo "== [$(date +%H:%M:%S)] witness eval (final ckpt)"
env SINCFORMER_MODEL_DIR=saved_models_r5_v4s0 \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
    --synth-noises multi --json-out /tmp/r5_rebuild/eval_check_v4s0b.json \
    > /tmp/r5_rebuild/eval_check_v4s0b.log 2>&1
python - <<'EOF'
import json, sys
a = json.load(open("/tmp/r5_rebuild/eval_check_v4s0b.json"))
b = json.load(open("results/r5/eval_v4s0.json"))
same = json.dumps(a["summary"], sort_keys=True) == \
       json.dumps(b["summary"], sort_keys=True)
print("determinism witness summaries identical:", same)
sys.exit(0 if same else 1)
EOF
echo "== witness exit: $?"

echo "== [$(date +%H:%M:%S)] re-export best -> serving artifact"
env SINCFORMER_MODEL_DIR=saved_models_r5_v4s0 \
    timeout 3600 python -m sincformer_tpu.cli export --ckpt best \
    --out artifacts/r5/sincformer_v4s0_best_serving

echo "== [$(date +%H:%M:%S)] int8 artifact grid eval"
env SINCFORMER_MODEL_DIR=artifacts/r5/sincformer_v4s0_best_serving \
    timeout 7200 python -m sincformer_tpu.cli evaluate --max-eval 8 \
    --synth-noises multi --json-out results/r5/eval_best_v4s0_int8.json \
    > results/r5/eval_best_v4s0_int8.log 2>&1
echo "== [$(date +%H:%M:%S)] re-export sequence complete"
