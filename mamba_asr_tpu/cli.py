"""Shared CLI driver for the training entry points.

Usage (mirrors the reference's `python train_CTC.py <yaml> [--overrides]`,
/root/reference/train_CTC.py:1025-1207):

    python train_ctc.py hparams/CTC/conmamba_small.yaml \
        --data.data_folder /path/to/LibriSpeech [--train.lr 0.0005 ...]

Pipeline: prepare manifests (process 0) -> fit/load tokenizer -> build
bucketed loaders -> Trainer.fit -> evaluate each test split with
checkpoint averaging.
"""

from __future__ import annotations

import math
import os
import sys
from typing import List, Optional

from mamba_asr_tpu.configs.loader import (
    ExperimentConfig,
    load_config,
    parse_overrides,
)
from mamba_asr_tpu.data.dataset import ASRDataset, BucketedLoader
from mamba_asr_tpu.data.librispeech import load_manifest, prepare_librispeech
from mamba_asr_tpu.data.tokenizer import (
    CharTokenizer,
    SubwordTokenizer,
    load_tokenizer,
)
from mamba_asr_tpu.parallel.mesh import is_main_process
from mamba_asr_tpu.training.loop import Trainer


def build_tokenizer(cfg: ExperimentConfig, train_csv: str):
    tok_path = os.path.join(
        cfg.output_folder, f"tokenizer_{cfg.data.tokenizer_type}.json"
    )
    if os.path.isfile(tok_path):
        return load_tokenizer(tok_path)
    corpus = [u.words for u in load_manifest(train_csv)]
    if cfg.data.tokenizer_type == "char":
        tok = CharTokenizer.fit(corpus, vocab_size=cfg.data.vocab_size)
    else:
        tok = SubwordTokenizer.train(
            corpus,
            vocab_size=cfg.data.vocab_size,
            model_type=cfg.data.tokenizer_type,
        )
    if is_main_process():
        os.makedirs(cfg.output_folder, exist_ok=True)
        tok.save(tok_path)
    return tok


def load_lm(cfg: ExperimentConfig, tokenizer=None):
    """Load the decode-time LM from disk if configured (the reference
    downloads one from HF at train_S2S.py:1235-1236; falls back to no-LM
    decoding like the reference's no_lm path, train_S2S.py:1247-1253).

    ``tokenizer`` is accepted for call-site symmetry but unused: the LM
    vocab is taken from ``cfg.model.vocab_size``.
    """
    if not cfg.decode.lm_path:
        return None, None
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from mamba_asr_tpu.models.lm import TransformerLM

    lm = TransformerLM(
        vocab_size=cfg.model.vocab_size,
        d_model=cfg.decode.lm_d_model,
        nhead=cfg.decode.lm_nhead,
        num_layers=cfg.decode.lm_layers,
        d_ffn=cfg.decode.lm_d_ffn,
        dtype=jnp.dtype(cfg.decode.lm_dtype),
    )
    target = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), train=False
    )
    if cfg.decode.lm_path.endswith((".ckpt", ".pt", ".pth")):
        # A reference PyTorch TransformerLM checkpoint (what the
        # reference's Pretrainer fetches from HF): import it directly.
        from mamba_asr_tpu.models.torch_import import load_torch_lm

        params = {"params": jax.tree_util.tree_map(
            jnp.asarray,
            load_torch_lm(cfg.decode.lm_path, cfg.decode.lm_layers),
        )}
        same = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda x: 0, params)
        ) == jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda x: 0, target)
        )
        if not same:
            raise ValueError(
                f"imported LM tree does not match the configured "
                f"TransformerLM (layers={cfg.decode.lm_layers}, "
                f"d_model={cfg.decode.lm_d_model})"
            )
        return lm, params
    with open(cfg.decode.lm_path, "rb") as f:
        params = serialization.from_bytes(target, f.read())
    return lm, params


def restore_asr_state(
    cfg: ExperimentConfig,
    ckpt_dir: str = "",
    torch_ckpt: str = "",
    torch_normalizer: str = "",
):
    """Inference-ready (model, state): build a template TrainState and
    restore either an experiment save dir (top-k averaged by WER, the
    reference's test-time averaging at train_CTC.py:262-268) or a
    reference PyTorch checkpoint via models/torch_import.py (the
    Pretrainer consumption path, train_S2S.py:1235-1236). Shared by
    recognize.py and serve.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamba_asr_tpu.models.asr import ASRModel
    from mamba_asr_tpu.training.checkpoint import CheckpointManager
    from mamba_asr_tpu.training.trainer import (
        init_train_state,
        make_optimizer,
    )

    model = ASRModel(cfg.model)
    tx = make_optimizer(cfg.train)
    dummy = {
        "wav": np.zeros((1, 16000), np.float32),
        "wav_lens": np.array([16000], np.int32),
        "tokens_bos": np.zeros((1, 4), np.int32),
    }
    state = init_train_state(
        model, tx, cfg.frontend, jax.random.PRNGKey(0), dummy
    )
    if torch_ckpt:
        import torch

        from mamba_asr_tpu.models.torch_import import (
            import_normalizer_stats,
            load_torch_asr,
        )

        params = jax.tree_util.tree_map(
            jnp.asarray, load_torch_asr(torch_ckpt, cfg.model)
        )
        state = state.replace(params=params)
        if torch_normalizer:
            obj = torch.load(torch_normalizer, map_location="cpu",
                             weights_only=True)
            mean, std, count = import_normalizer_stats(obj)
            state = state.replace(
                normalizer=state.normalizer._replace(
                    count=jnp.asarray(count, jnp.float32),
                    mean=jnp.asarray(mean, jnp.float32),
                    # NormalizerState keeps the Welford m2 = std^2 * n.
                    m2=jnp.asarray(std.astype(np.float64) ** 2 * count,
                                   jnp.float32),
                )
            )
    else:
        if not ckpt_dir:
            raise SystemExit("need --ckpt_dir or --torch_ckpt")
        mgr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
        restored = mgr.restore_averaged_raw(
            k=cfg.train.avg_checkpoints, min_key="WER"
        )
        if restored is None:
            raise SystemExit(f"no checkpoints in {ckpt_dir}")
        from flax import serialization

        avg_params, raw = restored
        state = state.replace(
            params=serialization.from_state_dict(state.params, avg_params),
            normalizer=serialization.from_state_dict(
                state.normalizer, raw["normalizer"]
            ),
        )
    return model, jax.device_put(state)


def run_training(argv: Optional[List[str]] = None) -> Trainer:
    argv = list(argv) if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: train_*.py <hparams.yaml> [--key value ...]")
    if "--distributed" in argv:
        # Multi-host: one process per host; jax.distributed wires the
        # mesh over ICI/DCN (the reference's torchrun/ddp_init_group
        # equivalent, SURVEY.md §5.8). On a TPU pod slice the
        # coordinator auto-detects; elsewhere set MASR_COORDINATOR /
        # MASR_NUM_PROCESSES / MASR_PROCESS_ID per process.
        argv.remove("--distributed")
        from mamba_asr_tpu.parallel.distributed import initialize

        initialize()
    import jax

    from mamba_asr_tpu.parallel.distributed import barrier

    cfg = load_config(argv[0], parse_overrides(argv[1:]))
    os.makedirs(cfg.output_folder, exist_ok=True)

    manifest_dir = os.path.join(cfg.output_folder, "manifests")
    if is_main_process():
        prepare_librispeech(
            data_folder=cfg.data.data_folder,
            save_folder=manifest_dir,
            tr_splits=cfg.data.train_splits,
            dev_splits=cfg.data.dev_splits,
            te_splits=cfg.data.test_splits,
            merge_lst=cfg.data.train_splits,
            merge_name=cfg.data.train_csv,
            skip_prep=cfg.data.skip_prep,
        )
    train_csv = os.path.join(manifest_dir, cfg.data.train_csv)
    if cfg.data.create_lexicon and is_main_process():
        from mamba_asr_tpu.data.librispeech import create_lexicon

        create_lexicon(manifest_dir, [cfg.data.train_csv])
    # Non-main processes wait for the manifests (shared filesystem, the
    # reference's run_on_main + ddp barrier pattern, train_CTC.py:1080).
    barrier("librispeech_prep")
    tokenizer = (
        build_tokenizer(cfg, train_csv) if is_main_process() else None
    )
    barrier("tokenizer_fit")
    if tokenizer is None:  # now guaranteed on disk; load, don't re-fit
        tokenizer = build_tokenizer(cfg, train_csv)

    lm_model, lm_params = load_lm(cfg, tokenizer)
    trainer = Trainer(cfg, tokenizer, lm_model=lm_model, lm_params=lm_params)
    # Batches must split evenly over the data axis AND over processes
    # (each process loads global_batch / process_count rows).
    n_data = math.lcm(trainer.mesh.shape["data"], jax.process_count())

    train_ds = ASRDataset.from_csv(train_csv, tokenizer, cfg.data.sample_rate)
    train_loader = BucketedLoader(
        train_ds,
        num_buckets=cfg.data.num_buckets,
        max_batch_seconds=cfg.data.max_batch_seconds,
        max_batch_ex=cfg.data.max_batch_ex,
        shuffle=cfg.data.sorting == "random",
        speed_perturb=cfg.data.speed_perturb,
        seed=cfg.seed,
        batch_divisor=n_data,
        num_workers=cfg.data.num_workers,
        # Each process loads only its slice of every global batch;
        # shard_batch reassembles on device (SURVEY.md §5.8).
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    valid_loader = None
    if cfg.data.dev_splits:
        valid_ds = ASRDataset.from_csv(
            os.path.join(manifest_dir, cfg.data.dev_splits[0] + ".csv"),
            tokenizer, cfg.data.sample_rate,
        )
        valid_loader = BucketedLoader(
            valid_ds,
            num_buckets=max(cfg.data.num_buckets // 2, 2),
            max_batch_seconds=cfg.data.valid_max_batch_seconds,
            shuffle=False,
            speed_perturb=False,
            num_workers=cfg.data.num_workers,
        )

    trainer.fit(train_loader, valid_loader)

    for split in cfg.data.test_splits:
        test_ds = ASRDataset.from_csv(
            os.path.join(manifest_dir, split + ".csv"),
            tokenizer, cfg.data.sample_rate,
        )
        test_loader = BucketedLoader(
            test_ds,
            num_buckets=max(cfg.data.num_buckets // 2, 2),
            max_batch_seconds=cfg.data.valid_max_batch_seconds,
            shuffle=False,
            speed_perturb=False,
            num_workers=cfg.data.num_workers,
        )
        decoder = (
            trainer.s2s_decoder(test=True)
            if trainer.is_s2s
            else trainer.ctc_decoder()
        )
        summary = trainer.evaluate(test_loader, test_name=split,
                                   decoder=decoder)
        print(f"{split}: {summary}")
    return trainer
