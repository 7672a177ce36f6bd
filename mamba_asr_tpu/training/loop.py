"""Epoch orchestration: the sb.Brain-fit equivalent, explicit and small.

Reference behaviors reproduced (SURVEY.md §2.1 training drivers):
- per-epoch train pass with grad accumulation + Noam (inside the jitted
  step, training/trainer.py);
- normalizer statistics updated only while epoch <= update_until_epoch
  (/root/reference/hparams/CTC/conmamba_large.yaml:218);
- validation each epoch: greedy-WER for CTC (train_CTC.py:306,590-610),
  token accuracy for S2S (train_S2S.py:545) with beam search every
  valid_search_interval epochs (train_S2S.py:382-394);
- checkpoint keep-10 by min WER / max ACC (train_CTC.py:653-657,
  train_S2S.py:799-803), parameter averaging before evaluation
  (train_CTC.py:479-489);
- train_log.txt rows per epoch (train_CTC.py:620-652);
- auto-resume from the latest checkpoint at fit() start (SpeechBrain
  Brain behavior, SURVEY.md §5.3).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.configs.loader import ExperimentConfig
from mamba_asr_tpu.data.dataset import BucketedLoader
from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode, tokens_to_lists
from mamba_asr_tpu.models.asr import ASRModel
from mamba_asr_tpu.parallel.distributed import fetch_global
from mamba_asr_tpu.parallel.mesh import (
    activation_mesh,
    is_main_process,
    make_mesh,
    place_state,
    scoped_to_mesh,
    shard_batch,
)
from mamba_asr_tpu.training.checkpoint import CheckpointManager
from mamba_asr_tpu.training.logger import FileTrainLogger, JsonlLogger
from mamba_asr_tpu.training.metrics import AccuracyStats, ErrorRateStats
from mamba_asr_tpu.training.trainer import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


class Trainer:
    def __init__(self, cfg: ExperimentConfig, tokenizer, mesh=None,
                 lm_model=None, lm_params=None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        tp = getattr(cfg, "parallel", None)
        self.tp = tp.tensor_parallel if tp else 1
        self.sp = getattr(tp, "sequence_parallel", 1) if tp else 1
        self.pp = getattr(tp, "pipeline_stages", 1) if tp else 1
        self.min_shard_elements = tp.min_shard_elements if tp else 1 << 14
        self.mesh = mesh or make_mesh(model=self.tp, seq=self.sp,
                                      pipe=self.pp)
        self.model = ASRModel(cfg.model)
        self.tx = make_optimizer(cfg.train)
        # Layer-boundary activation sharding constraints are scoped to this
        # trainer's mesh at each step call (trace-time; no-op on 1-device
        # meshes) — no global state survives between trainers, so two
        # differently-meshed trainers in one process trace independently.
        self.train_step = scoped_to_mesh(
            make_train_step(
                self.model, self.tx, cfg.frontend, cfg.train, cfg.specaug,
                parallel=tp, mesh=self.mesh,
            ),
            self.mesh,
        )
        self.eval_step = scoped_to_mesh(
            make_eval_step(self.model, cfg.frontend), self.mesh
        )
        out_dir = cfg.output_folder
        self.ckpt = CheckpointManager(
            os.path.join(out_dir, "save"), keep=cfg.train.keep_checkpoints
        )
        self.logger = FileTrainLogger(os.path.join(out_dir, "train_log.txt"))
        self.steps_logger = JsonlLogger(os.path.join(out_dir, "steps.jsonl"))
        self.wandb_logger = None
        if cfg.train.use_wandb and is_main_process():
            from mamba_asr_tpu.training.logger import WandbLogger

            self.wandb_logger = WandbLogger(
                project=cfg.train.wandb_project, name=cfg.name,
            )
        self.state: Optional[TrainState] = None
        self.nproc = jax.process_count()
        self.is_s2s = cfg.model.num_decoder_layers > 0
        self.metric_key = "ACC" if self.is_s2s else "WER"
        self.start_epoch = 1
        self.lm_model = lm_model
        self.lm_params = lm_params
        self._searchers = {}

    def make_s2s_searcher(self, test: bool = True):
        """Beam searcher per the decode config (valid: beam 10 CTC-only;
        test: beam 66 + CTC 0.4 + LM 0.6, hparams/S2S/*:331-373).
        One instance per mode is cached so its per-shape jitted searches
        are reused across epochs/batches."""
        from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher

        cached = self._searchers.get(test)
        if cached is not None:
            return cached

        d = self.cfg.decode
        searcher = S2SBeamSearcher(
            self.model,
            beam_size=d.s2s_test_beam_size if test else d.valid_beam_size,
            ctc_weight=d.ctc_weight_decode,
            ctc_candidates=d.ctc_candidates,
            lm_weight=d.lm_weight if (test and self.lm_model) else 0.0,
            temperature=d.temperature,
            temperature_lm=d.temperature_lm,
            length_normalization=d.length_normalization,
            max_decode_ratio=d.max_decode_ratio,
            min_decode_ratio=d.min_decode_ratio,
            lm_model=self.lm_model if test else None,
        )
        self._searchers[test] = searcher
        return searcher

    # -- multi-process helpers ------------------------------------------------

    def _host_state(self):
        """Host copy of the train state for checkpointing. Multi-host
        tensor-parallel layouts hold cross-process shards, so the gather
        is a COLLECTIVE — call on every process, write on process 0."""
        if self.nproc == 1:
            return jax.device_get(self.state)
        from mamba_asr_tpu.parallel.distributed import tree_fetch_global

        return tree_fetch_global(self.state)

    def _eval_batch(self, batch):
        """Device placement for a validation/test batch. The valid/test
        loaders are NOT process-sharded (every process loads the full
        batch — refs/ids must be host-visible everywhere), so under
        multi-process the identical full batch is turned into one global
        data-sharded array per entry (process_sharded=False)."""
        arrays = {k: v for k, v in batch.items()
                  if k not in ("ids", "bucket")}
        if self.nproc > 1:
            return shard_batch(arrays, self.mesh, process_sharded=False)
        return {k: jnp.asarray(v) for k, v in arrays.items()}

    def ctc_decoder(self):
        """Decoder hook for evaluate(): on-device CTC prefix beam search
        (test-time decoder of the CTC recipes, beam 100 with logp pruning,
        hparams/CTC/conmamba_large.yaml:232-237)."""
        from mamba_asr_tpu.decoding.ctc_beam import ctc_beam_search

        d = self.cfg.decode

        def decode(params, normalizer, batch, eval_out):
            toks, lens = ctc_beam_search(
                eval_out["ctc_log_probs"],
                eval_out["enc_lengths"],
                beam_size=d.test_beam_size,
                blank_id=d.blank_index,
                beam_prune_logp=d.beam_prune_logp,
                token_prune_min_logp=d.token_prune_min_logp,
            )
            return tokens_to_lists(fetch_global(toks), fetch_global(lens))

        return scoped_to_mesh(decode, self.mesh)

    def s2s_decoder(self, test: bool = True):
        """Decoder hook for evaluate(): joint beam search."""
        from mamba_asr_tpu.decoding.s2s_beam import strip_special

        searcher = self.make_s2s_searcher(test)

        def decode(params, normalizer, batch, eval_out):
            toks, lens, _ = searcher(
                {"params": params},
                eval_out["enc_out"],
                eval_out["enc_lengths"],
                ctc_log_probs=eval_out["ctc_log_probs"],
                lm_params=self.lm_params if test else None,
            )
            return strip_special(fetch_global(toks), fetch_global(lens))

        return scoped_to_mesh(decode, self.mesh)

    # -- state ---------------------------------------------------------------

    def init_state(self, example_batch: Dict[str, np.ndarray]) -> None:
        rng = jax.random.PRNGKey(self.cfg.seed)
        with activation_mesh(self.mesh):
            self.state = init_train_state(
                self.model, self.tx, self.cfg.frontend, rng, example_batch
            )
        # Auto-resume (reference Brain recovers latest at fit start).
        # Resume from the max-epoch TRAINING checkpoint — averaged
        # checkpoints (written by evaluate()) carry no epoch and must
        # never be a resume candidate (they'd restart training at epoch 1
        # from parameter-averaged weights).
        entries = self.ckpt._entries()  # averaged entries already excluded
        candidates = [e for e in entries if "epoch" in e.get("metrics", {})]
        if candidates:
            meta = max(candidates, key=lambda e: e["metrics"]["epoch"])
            restored = self.ckpt.restore(
                jax.device_get(self.state), name=meta["name"]
            )
            self.start_epoch = int(meta["metrics"]["epoch"]) + 1
            self.state = restored
            print(f"resumed from checkpoint at epoch {self.start_epoch - 1}")
        # Explicit mesh placement: tensor-parallel kernels (and their
        # optimizer-state mirrors) shard over "model"; everything else
        # replicates. Plain replication when tensor_parallel == 1.
        self.state = place_state(
            self.state, self.mesh, self.min_shard_elements,
            pipeline_layers=(
                self.cfg.model.num_encoder_layers if self.pp > 1 else 0
            ),
        )

    # -- training -------------------------------------------------------------

    def fit(
        self,
        train_loader: BucketedLoader,
        valid_loader: Optional[BucketedLoader] = None,
        epochs: Optional[int] = None,
    ) -> None:
        cfg = self.cfg
        epochs = epochs or cfg.train.number_of_epochs
        # Per-step loss floats across all fit() epochs — the trajectory
        # surface the multi-process equality test (and any user) can
        # compare against a single-process run on the same data.
        self.loss_history = getattr(self, "loss_history", [])
        # Typed key so train.rng_impl can route dropout/specaug mask
        # bit-gen through the TPU hardware RngBitGenerator
        # (impl="unsafe_rbg"); the default threefry impl produces the
        # same bits as the legacy PRNGKey path.
        base_rng = jax.random.key(cfg.seed + 1, impl=cfg.train.rng_impl)

        from mamba_asr_tpu.data.dataset import prefetch_iterator

        # Initialize (and auto-resume) BEFORE computing the epoch range:
        # init_state sets start_epoch from the restored checkpoint, so a
        # lazy first-batch init would silently restart at epoch 1 (and
        # re-run the normalizer-update epochs) after a resume.
        if self.state is None:
            first = next(iter(train_loader.epoch(self.start_epoch)), None)
            if first is not None:
                self.init_state(first)

        for epoch in range(self.start_epoch, epochs + 1):
            t0 = time.time()
            update_norm = epoch <= cfg.train.normalizer_update_epochs
            losses = []  # device arrays; converted once at epoch end so
            # steps dispatch asynchronously (a per-step float() would
            # force a sync every step).
            batches = prefetch_iterator(
                train_loader.epoch(epoch),
                size=cfg.data.prefetch_batches,
            )
            # Train batches from a process-sharded loader hold only this
            # process's rows; shard_batch(process_sharded=True) then
            # assembles the global batch across processes (single-process:
            # plain data-sharded device_put, identical behavior to r4).
            proc_sharded = getattr(train_loader, "process_count", 1) > 1
            for i, batch in enumerate(batches):
                if self.state is None:
                    self.init_state(batch)
                rng = jax.random.fold_in(base_rng, epoch * 100003 + i)
                sharded = shard_batch(
                    {k: v for k, v in batch.items() if k not in ("ids", "bucket")},
                    self.mesh,
                    process_sharded=proc_sharded,
                )
                self.state, metrics = self.train_step(
                    self.state, sharded, rng, jnp.asarray(update_norm)
                )
                losses.append(metrics["loss"])
                if i % 50 == 0 and is_main_process():
                    self.steps_logger.log(
                        epoch=epoch, step=int(self.state.step),
                        loss=float(metrics["loss"]),
                        grad_norm=float(metrics["grad_norm"]),
                    )
            losses = [float(x) for x in jax.device_get(losses)]
            train_stats = {"loss": float(np.mean(losses)) if losses else 0.0}
            self.loss_history.extend(losses)

            valid_stats = {}
            if valid_loader is not None:
                valid_stats = self.validate(valid_loader, epoch)

            dur = time.time() - t0
            if is_main_process():
                self.logger.log_stats(
                    {"epoch": epoch, "steps": int(self.state.step),
                     "epoch_sec": round(dur, 1)},
                    train_stats=train_stats,
                    valid_stats=valid_stats,
                )
            if self.wandb_logger is not None:
                self.wandb_logger.log_stats(
                    {"epoch": epoch}, train_stats=train_stats,
                    valid_stats=valid_stats,
                )
            if valid_stats:
                # The host gather is a collective under multi-host TP —
                # every process participates; only process 0 writes.
                host_state = self._host_state()
                if is_main_process():
                    min_keys = () if self.is_s2s else ("WER",)
                    max_keys = ("ACC",) if self.is_s2s else ()
                    self.ckpt.save(
                        host_state,
                        metrics={**valid_stats, "epoch": epoch},
                        min_keys=min_keys,
                        max_keys=max_keys,
                    )

    # -- validation -----------------------------------------------------------

    def validate(self, loader: BucketedLoader, epoch: int) -> Dict[str, float]:
        """Greedy-CTC WER/CER (+ S2S accuracy) every epoch; for S2S, the
        joint beam search runs every `valid_search_interval` epochs
        (reference: train_S2S.py:382-394, interval 10 with beam 10)."""
        wer = ErrorRateStats()
        cer = ErrorRateStats(split_tokens=True)
        acc = AccuracyStats()
        beam_decoder = None
        if (
            self.is_s2s
            and epoch % self.cfg.decode.valid_search_interval == 0
        ):
            beam_decoder = self.s2s_decoder(test=False)
        from mamba_asr_tpu.data.dataset import prefetch_iterator

        for batch in prefetch_iterator(
            loader.epoch(0), size=self.cfg.data.prefetch_batches
        ):
            jbatch = self._eval_batch(batch)
            out = self.eval_step(
                self.state.params, self.state.normalizer, jbatch
            )
            real = int(batch["weight"].sum())
            if beam_decoder is not None:
                hyp_ids = beam_decoder(
                    self.state.params, self.state.normalizer, jbatch, out
                )
            else:
                toks, lens = ctc_greedy_decode(
                    out["ctc_log_probs"], out["enc_lengths"]
                )
                hyp_ids = tokens_to_lists(
                    fetch_global(toks), fetch_global(lens)
                )
            hyps = [self.tokenizer.decode(t) for t in hyp_ids][:real]
            refs = [
                self.tokenizer.decode(
                    list(batch["tokens"][i, : batch["token_lens"][i]])
                )
                for i in range(real)
            ]
            wer.append(batch["ids"][:real], hyps, refs)
            cer.append(batch["ids"][:real], hyps, refs)
            if self.is_s2s:
                acc.append(
                    fetch_global(out["seq_log_probs"]),
                    batch["tokens_eos"],
                    batch["eos_lens"],
                    batch["weight"],
                )
        stats = {
            "WER": wer.summarize()["WER"],
            "CER": cer.summarize()["WER"],
        }
        if self.is_s2s:
            stats["ACC"] = acc.summarize()
        return stats

    # -- evaluation -----------------------------------------------------------

    def evaluate(
        self,
        loader: BucketedLoader,
        test_name: str = "test",
        use_averaged: bool = True,
        decoder=None,
    ) -> Dict[str, float]:
        """Full test pass with checkpoint averaging + WER file dump.

        `decoder(params, normalizer, batch, eval_out) -> list[list[int]]`
        overrides greedy decoding (beam searchers plug in here).
        """
        state = self.state
        if use_averaged:
            restored = self.ckpt.restore_averaged(
                self._host_state(),
                k=self.cfg.train.avg_checkpoints,
                min_key=None if self.is_s2s else "WER",
                max_key="ACC" if self.is_s2s else None,
                select=lambda s: s.params,
            )
            if restored is not None:
                full, avg_params = restored
                state = place_state(
                    full.replace(params=avg_params),
                    self.mesh, self.min_shard_elements,
                    pipeline_layers=(
                        self.cfg.model.num_encoder_layers
                        if self.pp > 1 else 0
                    ),
                )

        wer = ErrorRateStats()
        cer = ErrorRateStats(split_tokens=True)
        from mamba_asr_tpu.data.dataset import prefetch_iterator

        for batch in prefetch_iterator(
            loader.epoch(0), size=self.cfg.data.prefetch_batches
        ):
            jbatch = self._eval_batch(batch)
            out = self.eval_step(state.params, state.normalizer, jbatch)
            real = int(batch["weight"].sum())
            if decoder is None:
                toks, lens = ctc_greedy_decode(
                    out["ctc_log_probs"], out["enc_lengths"]
                )
                hyp_ids = tokens_to_lists(
                    fetch_global(toks), fetch_global(lens)
                )
            else:
                hyp_ids = decoder(state.params, state.normalizer, jbatch, out)
            hyps = [self.tokenizer.decode(t) for t in hyp_ids][:real]
            refs = [
                self.tokenizer.decode(
                    list(batch["tokens"][i, : batch["token_lens"][i]])
                )
                for i in range(real)
            ]
            wer.append(batch["ids"][:real], hyps, refs)
            cer.append(batch["ids"][:real], hyps, refs)

        summary = {
            "WER": wer.summarize()["WER"],
            "CER": cer.summarize()["WER"],
        }
        if use_averaged:
            # Retain the averaged model as a single named checkpoint (the
            # reference's post-test averaged-checkpoint retention,
            # train_S2S.py:814-821 — without the ACC=1.1 metadata hack).
            # The gather is a collective under multi-host TP: all
            # processes run it, process 0 writes.
            if self.nproc == 1:
                host = jax.device_get(state)
            else:
                from mamba_asr_tpu.parallel.distributed import (
                    tree_fetch_global,
                )

                host = tree_fetch_global(state)
            if is_main_process():
                self.ckpt.save(
                    host,
                    metrics={**summary, "averaged": True},
                    name=f"averaged_{test_name}",
                )
        if is_main_process():
            out_path = os.path.join(
                self.cfg.output_folder, f"wer_{test_name}.txt"
            )
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            with open(out_path, "w", encoding="utf-8") as f:
                wer.write_stats(f)
            self.logger.log_stats(
                {"test_set": test_name}, test_stats=summary
            )
            if self.wandb_logger is not None:
                self.wandb_logger.log_stats(
                    {"test_set": test_name}, test_stats=summary
                )
        return summary
