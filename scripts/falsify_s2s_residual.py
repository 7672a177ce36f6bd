#!/usr/bin/env python
"""Falsify (or confirm) the two train-to-floor residual hypotheses
(VERDICT r4, weak #3; README train-to-floor table).

(a) TPU S2S 4.55 % residual — hypothesis: bf16 MXU matmul rounding
    (JAX's DEFAULT matmul precision on TPU computes fp32 matmuls at
    bf16 input precision) costs one token in this tiny over-fit
    regime. Falsification: train S2S conmamba_small (transformer
    decoder) exactly as the table row did, then decode the SAME
    averaged checkpoint twice in one process — default precision vs
    `jax_default_matmul_precision=highest` (full fp32 passes on the
    MXU). Hypothesis proven iff highest-precision decode reaches the
    CPU run's 0.00 %.

        python scripts/falsify_s2s_residual.py --part a [--epochs 240]

(b) ConMambaMamba (Mamba decoder) 29.2 % plateau — hypothesis: a
    32-utterance corpus is too small for the attention-free decoder to
    generalize at beam decode (memorizes teacher-forced, fails free-
    running), i.e. a data-regime property, not a model/loop defect.
    Falsification: train the SAME config on a larger corpus (default
    160 train utterances) — hypothesis proven iff test WER reaches
    ~the transformer-decoder floor there.

        python scripts/falsify_s2s_residual.py --part b [--epochs 150]

Runs on whatever backend jax resolves (the table rows name their
backends). Prints one RESULT json line per decode.
"""

from __future__ import annotations

import argparse
import json
import os
import runpy
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from train_to_floor import build_corpus, run_mode  # noqa: E402


def read_wer(exp_dir: str) -> str:
    with open(os.path.join(exp_dir, "wer_test-clean.txt")) as f:
        return f.readline().strip()


def evaluate_again(config: str, argv: list) -> None:
    old = sys.argv
    sys.argv = ["evaluate.py", config] + argv
    try:
        runpy.run_path(os.path.join(REPO, "evaluate.py"),
                       run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            raise
    finally:
        sys.argv = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["a", "b"], required=True)
    ap.add_argument("--epochs", type=int, default=0)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    work = args.workdir or tempfile.mkdtemp(prefix=f"falsify_{args.part}_")
    corpus = os.path.join(work, "corpus")

    if args.part == "a":
        epochs = args.epochs or 240
        if not os.path.isdir(os.path.join(corpus, "train-clean-100")):
            build_corpus(corpus)
        res = run_mode(
            "s2s", corpus, os.path.join(work, "out"), epochs,
            s2s_config="hparams/S2S/conmamba_small.yaml",
        )
        print("RESULT " + json.dumps(
            {**res, "backend": backend, "precision": "default"}
        ), flush=True)

        # Same checkpoint, full-fp32 matmuls. New traces pick the
        # precision up; evaluate.py re-jits everything.
        jax.config.update("jax_default_matmul_precision", "highest")
        # evaluate.py replays the training argv minus epoch control.
        # Must carry EVERY train_to_floor override that shapes the
        # restored TrainState (grad_accumulation_factor changes the
        # optax.MultiSteps opt-state structure) or restore fails.
        eval_argv = [
            "--data.data_folder", corpus,
            "--data.output_folder", os.path.join(work, "out", "s2s"),
            "--data.train_splits", "[train-clean-100]",
            "--data.test_splits", "[test-clean]",
            "--data.speed_perturb", "false",
            "--data.tokenizer_type", "char",
            "--model.d_model", "64", "--model.num_encoder_layers", "2",
            "--model.d_ffn", "128", "--model.compute_dtype", "float32",
            "--model.mamba.d_state", "8",
            "--frontend.n_mels", "40", "--model.n_mels", "40",
            "--train.lr", "0.002", "--train.warmup_steps", "60",
            "--train.grad_accumulation_factor", "1",
            "--train.keep_checkpoints", "5",
            "--train.avg_checkpoints", "5",
            "--data.num_buckets", "2",
            "--data.max_batch_seconds", "24.0",
            "--model.nhead", "2", "--model.num_decoder_layers", "1",
            "--train.ctc_weight", "0.3",
            "--decode.s2s_test_beam_size", "8",
        ]
        evaluate_again("hparams/S2S/conmamba_small.yaml", eval_argv)
        print("RESULT " + json.dumps({
            "mode": "s2s", "backend": backend, "precision": "highest",
            "wer_header": read_wer(res["exp_dir"]),
        }), flush=True)
    else:
        epochs = args.epochs or 150
        if not os.path.isdir(os.path.join(corpus, "train-clean-100")):
            build_corpus(corpus, n_train=160, n_dev=16, n_test=16)
        res = run_mode(
            "s2s", corpus, os.path.join(work, "out"), epochs,
            s2s_config="hparams/S2S/conmambamamba_small.yaml",
        )
        print("RESULT " + json.dumps(
            {**res, "backend": backend, "n_train": 160}
        ), flush=True)


if __name__ == "__main__":
    main()
