"""Worker process for tests/test_multiprocess.py.

Runs the REAL CLI training entry (`run_training` — manifest prep,
tokenizer fit, process-sharded BucketedLoader, Trainer.fit, validation)
either single-process or as one member of a jax.distributed group
(MASR_* env set by the parent), then dumps the per-step loss trajectory
and a parameter fingerprint so the parent can check 2-process ==
1-process exactly.

Invoked with a fresh interpreter: XLA_FLAGS (virtual CPU device count)
comes from the parent's env; the platform pin must happen before any
backend use because this environment's sitecustomize pre-imports jax.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    out_json = sys.argv[1]
    corpus = sys.argv[2]
    results = sys.argv[3]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    if os.environ.get("MASR_NUM_PROCESSES"):
        from mamba_asr_tpu.parallel.distributed import initialize

        initialize()

    from mamba_asr_tpu.cli import run_training

    argv = [
        os.path.join(repo, "hparams", "CTC", "conmamba_small.yaml"),
        "--data.data_folder", corpus,
        "--data.output_folder", results,
        "--data.train_splits", "[train-clean-100]",
        "--data.dev_splits", "[dev-clean]",
        "--data.test_splits", "[]",
        "--data.speed_perturb", "true",
        "--model.d_model", "16",
        "--model.num_encoder_layers", "1",
        "--model.d_ffn", "16",
        "--model.compute_dtype", "float32",
        "--model.dropout", "0.0",
        "--model.mamba.d_state", "4",
        "--frontend.n_mels", "20",
        "--model.n_mels", "20",
        "--train.number_of_epochs", "2",
        "--train.grad_accumulation_factor", "1",
        "--specaug.enabled", "false",
        "--data.num_buckets", "2",
        "--data.max_batch_seconds", "4.0",
        "--data.num_workers", "1",
    ]
    trainer = run_training(argv)

    if jax.process_index() == 0:
        from mamba_asr_tpu.parallel.distributed import fetch_global

        leaves = jax.tree_util.tree_leaves(trainer.state.params)
        fingerprint = [float(abs(fetch_global(x)).mean()) for x in leaves]
        with open(out_json, "w") as f:
            json.dump(
                {
                    "loss": trainer.loss_history,
                    "fingerprint": fingerprint,
                    "process_count": jax.process_count(),
                    "global_devices": jax.device_count(),
                },
                f,
            )
    else:
        # Non-main params must be gathered too (collective symmetry).
        from mamba_asr_tpu.parallel.distributed import fetch_global

        for x in jax.tree_util.tree_leaves(trainer.state.params):
            fetch_global(x)


if __name__ == "__main__":
    main()
