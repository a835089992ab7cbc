#!/usr/bin/env bash
# Round-4 TPU-gated sequence (TODO.md "TPU-gated") — run when the axon
# relay is back. Each stage is independently resumable; bounded timeouts
# everywhere (never kill by pattern). Logs under logs/r4/.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r4

probe() {
  (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null && return 0 || return 1
}
probe || { echo "relay down — aborting"; exit 1; }

echo "== 1. driver bench (the round gate) =="
timeout 3600 python bench.py 2>&1 | tee logs/r4/bench.log

echo "== 2. extended run: resume to 150 epochs =="
# saved_models_r3_ext holds the epoch-88 checkpoint (+20.69 dB val)
SINCFORMER_MODEL_DIR=saved_models_r3_ext timeout 14400 \
  python -m sincformer_tpu.cli train --pipeline agents --synthetic 64 \
  --epochs 150 --resume 2>&1 | tee logs/r4/ext150.log

echo "== 3. grid-eval the extended checkpoint (5 metrics + 4-noise) =="
SINCFORMER_MODEL_DIR=saved_models_r3_ext timeout 3600 \
  python -m sincformer_tpu.cli evaluate --max-eval 8 \
  --synth-noises multi 2>&1 | tee logs/r4/ext150_grid.log

echo "== 4. PA v5 ablation (dual fine streams), 50-epoch protocol =="
SINCFORMER_PA_FINE_FEATS=dual SINCFORMER_MODEL_DIR=saved_models_r4_pav5 \
  timeout 7200 python -m sincformer_tpu.cli train --pipeline agents \
  --synthetic 64 --epochs 50 --adversarial 2>&1 | tee logs/r4/pav5.log
SINCFORMER_MODEL_DIR=saved_models_r4_pav5 timeout 3600 \
  python -m sincformer_tpu.cli evaluate --max-eval 8 2>&1 \
  | tee logs/r4/pav5_grid.log

echo "== 5. re-bench (streaming device-OLA + any perf work) =="
timeout 3600 python bench.py 2>&1 | tee logs/r4/bench_final.log
echo "done — update RESULTS.md from logs/r4/"
