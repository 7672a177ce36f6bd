#!/bin/bash
# End-to-end serving validation on real hardware, through the real CLIs:
#   1. build a synthetic LibriSpeech-layout corpus,
#   2. train a tiny causal ConMamba CTC model with train_ctc.py,
#   3. serve the checkpoint with serve.py (--final ctc_beam),
#   4. stream audio files through the TCP client and print transcripts.
#
# Validated on a v5e (2026-08-19): 2-epoch train (0.6 s/epoch steady),
# server + final-pass beam compile over the remote tunnel, client
# round-trip exit 0. Run:  bash scripts/serve_e2e_tpu.sh [workdir]
set -ex
ROOT=${1:-/tmp/serve_e2e}
REPO=$(cd "$(dirname "$0")/.." && pwd)
rm -rf "$ROOT" && mkdir -p "$ROOT"
cd "$REPO"

python - "$ROOT" << 'PYEOF'
import numpy as np, os, sys
root = os.path.join(sys.argv[1], "LibriSpeech")
sys.path.insert(0, ".")
from mamba_asr_tpu.data.audio import write_wav
rng = np.random.default_rng(0)
words = ["HELLO", "WORLD", "SPEECH", "MODEL", "TPU", "SCAN"]
for split in ("train-clean-100", "dev-clean", "test-clean"):
    d = os.path.join(root, split, "1", "2")
    os.makedirs(d)
    lines = []
    for i in range(8):
        wav = rng.normal(0, 0.1, size=int(rng.integers(16000, 32000))).astype(np.float32)
        uid = f"1-2-{i:04d}"
        write_wav(os.path.join(d, uid + ".wav"), wav, 16000)
        lines.append(f"{uid} {' '.join(rng.choice(words, 3))}")
    with open(os.path.join(d, "1-2.trans.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
print("corpus ready")
PYEOF

TINY="--model.d_model 16 --model.num_encoder_layers 1 --model.d_ffn 16 \
  --model.compute_dtype float32 --model.mamba.d_state 4 \
  --model.causal true --model.bidirectional false \
  --frontend.n_mels 20 --model.n_mels 20"

timeout 1800 python train_ctc.py hparams/CTC/conmamba_small.yaml \
  --data.data_folder "$ROOT/LibriSpeech" --data.output_folder "$ROOT/out" \
  --data.train_splits "[train-clean-100]" --data.test_splits "[test-clean]" \
  --data.speed_perturb false $TINY \
  --train.number_of_epochs 2 --data.num_buckets 2 \
  --data.max_batch_seconds 8.0

SAVE=$(ls -d "$ROOT"/out/CTC/conmamba_small/*/save)
TOK=$(ls "$ROOT"/out/CTC/conmamba_small/*/tokenizer_char.json)

timeout 1800 python serve.py hparams/CTC/conmamba_small.yaml \
  --ckpt_dir "$SAVE" --tokenizer "$TOK" --slots 2 --chunk_frames 32 \
  --final ctc_beam --final_beam_size 4 --port 7461 $TINY \
  > "$ROOT/server.log" 2>&1 &
echo $! > "$ROOT/server.pid"
trap 'kill $(cat "$ROOT/server.pid") 2>/dev/null' EXIT

for i in $(seq 1 180); do
  grep -q "serving" "$ROOT/server.log" && break
  sleep 2
done

timeout 900 python serve.py --connect 127.0.0.1:7461 \
  "$ROOT"/LibriSpeech/test-clean/1/2/1-2-0000.wav \
  "$ROOT"/LibriSpeech/test-clean/1/2/1-2-0001.wav
echo "serve_e2e OK"
