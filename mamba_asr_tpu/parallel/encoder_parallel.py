"""Trainer wiring for sequence- and pipeline-parallel encoder execution.

parallel/sequence.py and parallel/pipeline.py provide the collectives and
schedules as library pieces; this module is the bridge that lets the
*trainer* run the ConMamba encoder stack under them from plain config
keys (`parallel.sequence_parallel`, `parallel.pipeline_stages` — see
configs/loader.py::ParallelConfig), composing with data parallelism on
the same mesh. The reference has no equivalent (DDP only,
/root/reference/train_CTC.py:1062); these are the TPU-native scaling
axes for long audio (sp) and deep stacks (pp).

Split point: ASRModel.encode_pre (frontend + projection, batch-sharded
over "data" like the rest of the step) -> this module runs the encoder
stack inside `jax.shard_map` -> ASRModel.forward_from_enc (heads +
decoder + losses). Only the stack is re-wired; everything outside it is
the standard jit/GSPMD path, so gradients flow through shard_map's
transpose and the optimizer update stays untouched.

Scope (asserted): `encoder_module == "conmamba"`. The ConMamba layer
ignores the key-padding mask by reference parity (Conmamba.py:631 zeroes
conv_mask; the SSM has no masking), so only the activation tensor needs
to travel — and the same caveat as bucket padding applies: with
`sequence_parallel`, the time axis is right-padded to a multiple of the
shard count, and bidirectional scans read those frames exactly as they
read ordinary bucket padding.

Dropout: inside shard_map each layer gets its own folded rng (matching
nn.scan's split_rngs in spirit, not key-for-key); pipeline microbatches
share per-layer masks. Trajectory-parity tests therefore run with
dropout 0 — as do the dp-vs-tp checks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from mamba_asr_tpu.parallel.mesh import activation_mesh
from mamba_asr_tpu.parallel.pipeline import pipeline_apply

Array = jax.Array


def _conmamba_encoder(model_cfg, seq_axis: Optional[str] = None,
                      scan_layers: Optional[bool] = None):
    from mamba_asr_tpu.models.conmamba import ConmambaEncoder

    assert model_cfg.encoder_module == "conmamba", (
        "sequence/pipeline-parallel training is wired for the ConMamba "
        f"encoder (got {model_cfg.encoder_module}); attention encoders "
        "need time-global ops the sp/pp schedules do not provide"
    )
    mamba_cfg = model_cfg.mamba
    if seq_axis is not None:
        mamba_cfg = dataclasses.replace(mamba_cfg, seq_axis=seq_axis)
    return ConmambaEncoder(
        num_layers=model_cfg.num_encoder_layers,
        d_model=model_cfg.d_model,
        d_ffn=model_cfg.d_ffn,
        kernel_size=model_cfg.kernel_size,
        activation=model_cfg.activation_fn(),
        bias=model_cfg.bias,
        dropout=model_cfg.dropout,
        causal=model_cfg.causal,
        mamba_cfg=mamba_cfg,
        bidirectional=model_cfg.bidirectional,
        scan_layers=(
            model_cfg.scan_layers if scan_layers is None else scan_layers
        ),
        remat_layers=model_cfg.remat_layers,
        dtype=model_cfg.dtype,
    )


def sp_encoder_apply(
    model_cfg,
    encoder_params,
    x: Array,
    mesh,
    rng: Optional[Array] = None,
    train: bool = False,
    data_axis: str = "data",
    seq_axis: str = "seq",
) -> Array:
    """Encoder stack with the time axis sharded over `seq_axis` (and the
    batch over `data_axis`), inside one shard_map. x: (B, T', d_model)
    global; returns (B, T', d_model) global."""
    n_seq = mesh.shape[seq_axis]
    enc = _conmamba_encoder(model_cfg, seq_axis=seq_axis)
    t = x.shape[1]
    tp = -(-t // n_seq) * n_seq
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    def body(params, xx):
        rngs = None
        if train and rng is not None and model_cfg.dropout > 0:
            shard = jax.lax.axis_index(seq_axis)
            rngs = {"dropout": jax.random.fold_in(rng, shard)}
        # The layer-boundary constrain_batch hooks are jit/GSPMD hints;
        # inside shard_map the sharding is already explicit.
        with activation_mesh(None):
            return enc.apply({"params": params}, xx, train=train, rngs=rngs)

    y = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(data_axis, seq_axis, None)),
        out_specs=P(data_axis, seq_axis, None),
    )(encoder_params, x)
    return y[:, :t]


def pp_encoder_apply(
    model_cfg,
    encoder_params,
    x: Array,
    mesh,
    n_microbatches: int,
    rng: Optional[Array] = None,
    train: bool = False,
    data_axis: str = "data",
    pipe_axis: str = "pipe",
) -> Array:
    """Encoder stack with the (scanned) layer axis sharded over
    `pipe_axis` and run on the GPipe schedule; batch over `data_axis`.
    Requires model_cfg.scan_layers (the stacked parameter layout IS the
    stage assignment)."""
    from mamba_asr_tpu.models.conmamba import ConmambaEncoderLayer

    assert model_cfg.scan_layers, (
        "pipeline_stages > 1 needs model.scan_layers=true (stacked "
        "per-layer params are the stage assignment)"
    )
    n_pipe = mesh.shape[pipe_axis]
    assert model_cfg.num_encoder_layers % n_pipe == 0, (
        f"{model_cfg.num_encoder_layers} layers not divisible into "
        f"{n_pipe} pipeline stages"
    )
    enc = _conmamba_encoder(model_cfg)
    (body_key,) = encoder_params["stack"]["layers"].keys()
    stacked = encoder_params["stack"]["layers"][body_key]

    layer = ConmambaEncoderLayer(
        d_model=model_cfg.d_model,
        d_ffn=model_cfg.d_ffn,
        kernel_size=model_cfg.kernel_size,
        activation=model_cfg.activation_fn(),
        bias=model_cfg.bias,
        dropout=model_cfg.dropout,
        causal=model_cfg.causal,
        mamba_cfg=model_cfg.mamba,
        bidirectional=model_cfg.bidirectional,
        dtype=model_cfg.dtype,
    )
    use_drop = train and rng is not None and model_cfg.dropout > 0
    n_layers = model_cfg.num_encoder_layers
    layer_keys = (
        jax.random.split(rng, n_layers)
        if use_drop
        else jnp.zeros((n_layers, 2), jnp.uint32)
    )

    def layer_fn(p_and_key, h):
        p, key = p_and_key
        rngs = {"dropout": key} if use_drop else None
        if model_cfg.remat_layers:
            apply = jax.checkpoint(
                lambda pp, hh: layer.apply(
                    {"params": pp}, hh, None, train=train, rngs=rngs
                ),
                prevent_cse=False,
            )
            return apply(p, h)
        return layer.apply({"params": p}, h, None, train=train, rngs=rngs)

    def stage_fn(stage_params, h):
        def body(hh, pk):
            return layer_fn(pk, hh), None

        y, _ = jax.lax.scan(body, h, stage_params)
        return y

    def body(stage_params, xx):
        with activation_mesh(None):
            return pipeline_apply(
                stage_fn, stage_params, xx, n_microbatches,
                axis_name=pipe_axis,
            )

    y = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=((P(pipe_axis), P(pipe_axis)), P(data_axis)),
        out_specs=P(data_axis),
    )((stacked, layer_keys), x)
    # Final stack LayerNorm outside the pipeline (pointwise, replicated).
    return nn.LayerNorm(dtype=model_cfg.dtype).apply(
        {"params": encoder_params["norm"]}, y
    )
