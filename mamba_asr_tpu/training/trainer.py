"""The training loop: jitted pjit train/eval steps + epoch orchestration.

Replaces sb.core.Brain (/root/reference/train_CTC.py:164-717,
train_S2S.py:183-874): per-batch fbank -> normalize -> SpecAugment ->
forward -> CTC (+KL) loss -> grad-accumulated AdamW step with Noam LR and
global-norm clipping; per-epoch validation with greedy WER / accuracy,
top-k checkpointing, and file logging.

TPU-first deltas from the reference:
- the whole hot path (fbank included) lives inside ONE jitted function,
  so XLA fuses frontend, network, and loss; no host<->device transfers
  besides the raw waveform batch;
- static bucketed batch shapes: one executable per bucket, zero
  recompilation during training;
- data parallelism: batches arrive sharded over the mesh "data" axis,
  params replicated; XLA inserts the gradient all-reduce (SURVEY.md §5.8);
- gradient accumulation via cond_multi_steps (the reference's factor 4/8,
  /root/reference/hparams/CTC/conmamba_large.yaml:90) — trajectory-exact
  optax.MultiSteps semantics, but the inner clip+AdamW runs under the
  emit lax.cond so skip micro-steps pay only the accumulate traffic;
- bf16 compute with fp32 params/optimizer (precision: bf16, yaml:84).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mamba_asr_tpu.data.augment import spec_augment
from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.ops.ctc import ctc_loss
from mamba_asr_tpu.ops.fbank import log_mel_spectrogram
from mamba_asr_tpu.training.losses import joint_ctc_attention_loss, kldiv_loss
from mamba_asr_tpu.training.normalizer import (
    NormalizerState,
    apply_normalizer,
    init_normalizer,
    update_normalizer,
)
from mamba_asr_tpu.training.schedule import noam_schedule

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Fbank parameters (hparams/CTC/conmamba_large.yaml:102-106)."""

    sample_rate: int = 16000
    n_fft: int = 512
    n_mels: int = 80
    win_length_ms: float = 25.0
    hop_length_ms: float = 10.0

    @property
    def hop(self) -> int:
        return int(round(self.sample_rate * self.hop_length_ms / 1000.0))


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    """hparams/CTC/conmamba_large.yaml:273-320 (+S2S warp :409-459)."""

    enabled: bool = True
    num_time_drops: int = 4
    time_drop_width: int = 20
    num_freq_drops: int = 4
    freq_drop_width: int = 10
    apply_time_warp: bool = False
    time_warp_window: int = 5
    # "bicubic" = SpeechBrain Warping semantics (one batch-wide segment
    # resize pair, cubic a=-0.75, align_corners — the reference recipe
    # setting, conmamba_large.yaml:441); "linear" = the legacy
    # per-example piecewise-linear warp.
    time_warp_mode: str = "bicubic"
    # SpeechBrain Augmenter batch-composition semantics
    # (speechbrain.augment.augmenter.Augmenter; every shipped reference
    # recipe sets concat_original: False / repeat_augment: 1, i.e. the
    # in-place default below). When enabled, the train batch becomes
    # [original (if concat_original); repeat_augment independent
    # augmented copies] with labels/lengths/weights replicated to match
    # (train_CTC.py:401-403, train_S2S.py:505-516) and the batchmean
    # losses taken over the enlarged batch.
    concat_original: bool = False
    repeat_augment: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    warmup_steps: int = 7500
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-9
    weight_decay: float = 5e-4
    grad_accumulation_factor: int = 4
    max_grad_norm: float = 5.0
    ctc_weight: float = 1.0  # 1.0 = pure CTC; S2S uses 0.3
    label_smoothing: float = 0.0
    normalizer_update_epochs: int = 4
    number_of_epochs: int = 500
    keep_checkpoints: int = 10
    avg_checkpoints: int = 10
    seed: int = 3407
    # Reference S2S steps Noam twice per update (train_S2S.py:871-874).
    scheduler_steps_per_update: int = 1
    # Dynamic Chunk Training (TransformerASR.py:868-929 capability; none
    # of the shipped reference configs enable it). When set, the encoder
    # trains with chunked attention masks + Dynamic Chunk Convolution.
    dynchunk_size: Optional[int] = None
    dynchunk_left_context: Optional[int] = None
    # WandB mirror of the file logger (reference swaps its train_logger
    # for a WandBLogger at train_CTC.py:1130-1131); no-op if the wandb
    # package is absent.
    use_wandb: bool = False
    wandb_project: str = "mamba-asr-tpu"
    # PRNG implementation for the in-step dropout/SpecAugment keys.
    # "threefry2x32" (default) is deterministic across mesh shapes;
    # "unsafe_rbg" routes mask bit-gen through the TPU hardware
    # RngBitGenerator (measured on the ConMamba Large CTC step — see
    # docs/DESIGN.md §8c; weaker split/fold_in guarantees, fine for
    # dropout masks).
    rng_impl: str = "threefry2x32"


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    normalizer: NormalizerState
    step: Array  # micro-steps taken


class CondMultiStepsState(struct.PyTreeNode):
    """State of `cond_multi_steps` — optax.MultiStepsState minus the
    skip machinery (mini_step/gradient_step/inner_opt_state/acc_grads
    semantics are identical)."""

    mini_step: Array
    gradient_step: Array
    inner_opt_state: Any
    acc_grads: Any


class CondMultiSteps(NamedTuple):
    """GradientTransformation-shaped tuple (init/update duck-type) tagged
    with its inner tx and factor so `apply_accumulated_update` can route
    through the fused cond path."""

    init: Any
    update: Any
    inner: optax.GradientTransformation
    k: int


def cond_multi_steps(
    inner: optax.GradientTransformation, k: int
) -> optax.GradientTransformation:
    """Gradient accumulation with the inner update under `lax.cond`.

    Trajectory-exact replacement for `optax.MultiSteps(inner, k)`
    (use_grad_mean semantics: running mean of unscaled micro-grads), but
    the inner clip+AdamW — ~15 ms of HBM traffic for a 123 M-param
    fp32 state — runs ONLY on emit steps. optax's implementation
    computes it every micro-step and discards it with per-leaf
    `jnp.where(emit, ...)` selects, so at factor 8 ⅞ of all optimizer
    traffic is thrown away (measured: the S2S Large micro-step drops
    ~11 ms with this; tests/test_training_components.py proves 2·k-step
    trajectory equality against optax.MultiSteps).
    """

    def init(params):
        return CondMultiStepsState(
            mini_step=jnp.zeros((), jnp.int32),
            gradient_step=jnp.zeros((), jnp.int32),
            inner_opt_state=inner.init(params),
            acc_grads=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        # Running mean: acc += (g - acc) / (mini_step + 1), like optax's
        # MultiSteps._acc_update default.
        n = (state.mini_step + 1).astype(jnp.float32)
        acc = jax.tree_util.tree_map(
            lambda g, a: a + (g.astype(a.dtype) - a) / n,
            grads,
            state.acc_grads,
        )
        emit = state.mini_step == k - 1

        def do_emit(operand):
            acc, inner_state, params = operand
            updates, new_inner = inner.update(acc, inner_state, params)
            return (
                updates,
                new_inner,
                jax.tree_util.tree_map(jnp.zeros_like, acc),
            )

        def do_skip(operand):
            acc, inner_state, _ = operand
            zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)
            return zeros, inner_state, acc

        updates, new_inner, new_acc = jax.lax.cond(
            emit, do_emit, do_skip, (acc, state.inner_opt_state, params)
        )
        new_state = CondMultiStepsState(
            mini_step=(state.mini_step + 1) % k,
            gradient_step=state.gradient_step + emit.astype(jnp.int32),
            inner_opt_state=new_inner,
            acc_grads=new_acc,
        )
        return updates, new_state

    return CondMultiSteps(init, update, inner, k)


def apply_accumulated_update(tx, grads, opt_state, params):
    """(new_params, new_opt_state) — tx.update + optax.apply_updates.

    For a `cond_multi_steps` transformation the WHOLE update — running-
    mean accumulate, inner clip+AdamW, and the parameter apply — runs
    under the emit `lax.cond`, so skip micro-steps alias params and the
    inner optimizer state straight through (XLA forwards pass-through
    conditional buffers: measured 0.07 ms for a 2 GB carry) and pay only
    the accumulate traffic. Measured on the 123 M S2S-Large tree at
    factor 8 (v5e): optax.MultiSteps 7.09 ms/micro-step → 2.7 ms
    (scripts/bench_optimizer.py). Trajectory-exact vs optax.MultiSteps
    (tests/test_training_components.py)."""
    if not isinstance(tx, CondMultiSteps):
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    inner, k, state = tx.inner, tx.k, opt_state
    n = (state.mini_step + 1).astype(jnp.float32)
    acc = jax.tree_util.tree_map(
        lambda g, a: a + (g.astype(a.dtype) - a) / n,
        grads,
        state.acc_grads,
    )
    emit = state.mini_step == k - 1

    def do_emit(operand):
        params, inner_state, acc = operand
        updates, new_inner = inner.update(acc, inner_state, params)
        return (
            optax.apply_updates(params, updates),
            new_inner,
            jax.tree_util.tree_map(jnp.zeros_like, acc),
        )

    def do_skip(operand):
        return operand

    new_params, new_inner, new_acc = jax.lax.cond(
        emit, do_emit, do_skip, (params, state.inner_opt_state, acc)
    )
    new_state = CondMultiStepsState(
        mini_step=(state.mini_step + 1) % k,
        gradient_step=state.gradient_step + emit.astype(jnp.int32),
        inner_opt_state=new_inner,
        acc_grads=new_acc,
    )
    return new_params, new_state


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = noam_schedule(
        cfg.lr, cfg.warmup_steps, cfg.scheduler_steps_per_update
    )

    def wd_mask(params):
        # No weight decay on 1-D params (biases, LN) nor on the SSM's
        # A_log/D/dt_bias (reference marks them _no_weight_decay,
        # bimamba.py:130,134).
        def keep(path, x):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("A_log", "D", "dt_bias"):
                return False
            return jnp.ndim(x) >= 2

        return jax.tree_util.tree_map_with_path(keep, params)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=wd_mask,
        ),
    )
    if cfg.grad_accumulation_factor > 1:
        tx = cond_multi_steps(tx, cfg.grad_accumulation_factor)
    return tx


def compute_features(frontend: FrontendConfig, wav: Array) -> Array:
    return log_mel_spectrogram(
        wav,
        sample_rate=frontend.sample_rate,
        n_fft=frontend.n_fft,
        n_mels=frontend.n_mels,
        win_length_ms=frontend.win_length_ms,
        hop_length_ms=frontend.hop_length_ms,
    )


def frame_lengths(frontend: FrontendConfig, wav_lens: Array) -> Array:
    return wav_lens // frontend.hop + 1


def make_train_step(
    model: ASRModel,
    tx: optax.GradientTransformation,
    frontend: FrontendConfig,
    train_cfg: TrainConfig,
    specaug: SpecAugmentConfig,
    parallel=None,
    mesh=None,
):
    """Returns jitted (state, batch, rng, update_norm) -> (state, metrics).

    parallel (configs.loader.ParallelConfig) + mesh activate the
    sequence-/pipeline-parallel encoder path: the step splits at
    ASRModel.encode_pre, runs the ConMamba stack under shard_map over the
    mesh's "seq" or "pipe" axis (parallel/encoder_parallel.py), and
    rejoins at forward_from_enc. Everything else — dp batch sharding, tp
    param sharding, the optimizer — is the ordinary jit/GSPMD path.
    """
    use_sp = (
        parallel is not None
        and getattr(parallel, "sequence_parallel", 1) > 1
    )
    use_pp = (
        parallel is not None
        and getattr(parallel, "pipeline_stages", 1) > 1
    )
    assert not (use_sp and use_pp), (
        "sequence_parallel and pipeline_stages cannot combine (yet): "
        "both re-wire the same encoder stack"
    )
    if use_sp or use_pp:
        assert mesh is not None, "sp/pp training needs the trainer mesh"
        assert train_cfg.dynchunk_size is None, (
            "dynamic-chunk training is not wired through the sp/pp "
            "encoder path"
        )

    def parallel_forward(params, feats, flens, batch, rng):
        """Full forward with the encoder stack under shard_map."""
        from mamba_asr_tpu.parallel.encoder_parallel import (
            pp_encoder_apply,
            sp_encoder_apply,
        )

        variables = {"params": params}
        drop = {"dropout": jax.random.fold_in(rng, 1)}
        x, enc_lengths = model.apply(
            variables, feats, flens, train=True,
            method=ASRModel.encode_pre, rngs=drop,
        )
        rng_enc = jax.random.fold_in(rng, 2)
        if use_sp:
            enc = sp_encoder_apply(
                model.cfg, params["encoder"], x, mesh,
                rng=rng_enc, train=True,
            )
        else:
            enc = pp_encoder_apply(
                model.cfg, params["encoder"], x, mesh,
                parallel.pipeline_microbatches, rng=rng_enc, train=True,
            )
        use_decoder = model.cfg.num_decoder_layers > 0
        return model.apply(
            variables, enc, enc_lengths,
            batch["tokens_bos"] if use_decoder else None,
            train=True, method=ASRModel.forward_from_enc,
            rngs={"dropout": jax.random.fold_in(rng, 3)},
        )

    def loss_fn(params, normalizer, batch, rng):
        feats = compute_features(frontend, batch["wav"])
        t = feats.shape[1]
        flens = jnp.minimum(frame_lengths(frontend, batch["wav_lens"]), t)
        feats = apply_normalizer(normalizer, feats)
        if specaug.enabled:
            aug = lambda f, r: spec_augment(
                f,
                r,
                num_time_drops=specaug.num_time_drops,
                time_drop_width=specaug.time_drop_width,
                num_freq_drops=specaug.num_freq_drops,
                freq_drop_width=specaug.freq_drop_width,
                apply_time_warp=specaug.apply_time_warp,
                time_warp_window=specaug.time_warp_window,
                time_warp_mode=specaug.time_warp_mode,
            )
            reps = max(specaug.repeat_augment, 1)
            if specaug.concat_original or reps > 1:
                # Augmenter parity mode: [orig?; reps augmented copies],
                # labels replicated below, batchmean over the enlarged
                # batch (train_CTC.py:401-405).
                parts = [feats] if specaug.concat_original else []
                parts += [
                    aug(feats, jax.random.fold_in(rng, 100 + i))
                    for i in range(reps)
                ]
                n_copies = len(parts)
                feats = jnp.concatenate(parts, axis=0)
                flens = jnp.tile(flens, n_copies)
                rep = lambda x: jnp.tile(
                    x, (n_copies,) + (1,) * (x.ndim - 1)
                )
                batch = dict(batch)
                for key_ in ("tokens", "token_lens", "tokens_bos",
                             "tokens_eos", "eos_lens", "weight"):
                    if key_ in batch:
                        batch[key_] = rep(batch[key_])
            else:
                feats = aug(feats, rng)
        use_decoder = model.cfg.num_decoder_layers > 0
        if use_sp or use_pp:
            out = parallel_forward(params, feats, flens, batch, rng)
        else:
            out = model.apply(
                {"params": params},
                feats,
                flens,
                batch["tokens_bos"] if use_decoder else None,
                chunk_size=train_cfg.dynchunk_size,
                left_context_chunks=train_cfg.dynchunk_left_context,
                train=True,
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
        weight = batch["weight"]
        loss_ctc = ctc_loss(
            out["ctc_log_probs"],
            batch["tokens"],
            out["enc_lengths"],
            batch["token_lens"],
            reduction="batchmean",
            weight=weight,
        )
        metrics = {"loss_ctc": loss_ctc}
        if use_decoder:
            loss_att = kldiv_loss(
                out["seq_log_probs"],
                batch["tokens_eos"],
                batch["eos_lens"],
                label_smoothing=train_cfg.label_smoothing,
                reduction="batchmean",
                weight=weight,
            )
            loss = joint_ctc_attention_loss(
                loss_ctc, loss_att, train_cfg.ctc_weight
            )
            metrics["loss_att"] = loss_att
        else:
            loss = loss_ctc
        metrics["loss"] = loss
        # NOTE: no division by grad_accumulation_factor here. The reference
        # divides the loss by k and then SUMS micro-grads via backward
        # accumulation (sb.Brain fit_batch) — which equals the MEAN of
        # unscaled micro-grads. cond_multi_steps (MultiSteps semantics)
        # already takes that mean, so dividing here would shrink effective
        # gradients k× and make clip_by_global_norm fire at 5·k in
        # reference units.
        return loss, metrics

    def train_step(state: TrainState, batch, rng, update_norm):
        feats_for_norm = compute_features(frontend, batch["wav"])
        t = feats_for_norm.shape[1]
        flens = jnp.minimum(frame_lengths(frontend, batch["wav_lens"]), t)
        fmask = (
            jnp.arange(t)[None, :] < flens[:, None]
        ) & (batch["weight"][:, None] > 0)
        new_norm = update_normalizer(state.normalizer, feats_for_norm, fmask)
        normalizer = jax.tree_util.tree_map(
            lambda new, old: jnp.where(update_norm, new, old),
            new_norm,
            state.normalizer,
        )

        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, normalizer, batch, rng
        )
        new_params, new_opt = apply_accumulated_update(
            tx, grads, state.opt_state, state.params
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            params=new_params,
            opt_state=new_opt,
            normalizer=normalizer,
            step=state.step + 1,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model: ASRModel, frontend: FrontendConfig):
    """(params, normalizer, batch) -> dict with ctc_log_probs etc."""

    def eval_step(params, normalizer, batch):
        feats = compute_features(frontend, batch["wav"])
        t = feats.shape[1]
        flens = jnp.minimum(frame_lengths(frontend, batch["wav_lens"]), t)
        feats = apply_normalizer(normalizer, feats)
        use_decoder = model.cfg.num_decoder_layers > 0
        out = model.apply(
            {"params": params},
            feats,
            flens,
            batch["tokens_bos"] if use_decoder else None,
            train=False,
        )
        res = {
            "ctc_log_probs": out["ctc_log_probs"],
            "enc_lengths": out["enc_lengths"],
            "enc_out": out["enc_out"],
        }
        if use_decoder:
            res["seq_log_probs"] = out["seq_log_probs"]
        return res

    return jax.jit(eval_step)


def init_train_state(
    model: ASRModel,
    tx: optax.GradientTransformation,
    frontend: FrontendConfig,
    rng: jax.Array,
    example_batch: Dict[str, np.ndarray],
) -> TrainState:
    feats = compute_features(frontend, jnp.asarray(example_batch["wav"][:1]))
    use_decoder = model.cfg.num_decoder_layers > 0
    variables = model.init(
        rng,
        feats,
        jnp.asarray(example_batch["wav_lens"][:1] // frontend.hop + 1),
        jnp.asarray(example_batch["tokens_bos"][:1]) if use_decoder else None,
    )
    params = variables["params"]
    if model.cfg.xavier_parity_init:
        params = xavier_reinit(params, jax.random.fold_in(rng, 7))
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        normalizer=init_normalizer(frontend.n_mels),
        step=jnp.zeros((), jnp.int32),
    )


def xavier_reinit(params, rng: jax.Array):
    """Reference-parity init quirk: xavier_normal for EVERY parameter with
    ndim > 1 (/root/reference/modules/TransformerASR.py:1051-1054) — this
    *overwrites* the SSM's S4D A_log and dt_kernel init, exactly like the
    reference does. Off by default (ASRConfig.xavier_parity_init)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))

    def reinit(leaf, key):
        if leaf.ndim <= 1:
            return leaf
        fan_in = int(np.prod(leaf.shape[:-1]))
        fan_out = int(leaf.shape[-1])
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        return (jax.random.normal(key, leaf.shape, jnp.float32) * std).astype(
            leaf.dtype
        )

    return jax.tree_util.tree_unflatten(
        treedef, [reinit(l, k) for l, k in zip(leaves, keys)]
    )


def num_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
