"""Top-level ASR model assembly (the reference's TransformerASR + CNN +
ctc_lin/seq_lin object graph folded into one flax module).

Reference: /root/reference/modules/TransformerASR.py:428-1105 —
- conv frontend -> flatten (B,T',F',C) -> (B,T',F'*C)  (:760-762)
- custom_src_module Linear(input_size -> d_model) + dropout (:726-734)
- positional-encoding dispatch by attention type (:774-781)
- encoder select: transformer | conformer | conmamba
  (/root/reference/modules/Transformer.py:690-758)
- decoder select: transformer (always causal, regularMHA) | mamba
  (/root/reference/modules/Transformer.py:760-789)
- custom_tgt_module NormalizedEmbedding (:739-742)
- ctc head / seq head (the hparams' ctc_lin & seq_lin Linears, e.g.
  /root/reference/hparams/CTC/conmamba_large.yaml:212-215)

Init policy: the reference xavier_normal-reinitializes every parameter
with ndim > 1 (:1051-1054), which *overwrites* Mamba's S4D A_log and dt
init — SURVEY.md §7 recommends keeping the proper SSM init. This model
keeps S4D init by default; `xavier_parity_init=True` reproduces the
reference quirk for parity experiments.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_asr_tpu.models.conformer import ConformerEncoder
from mamba_asr_tpu.models.conmamba import ConmambaEncoder, MambaDecoder
from mamba_asr_tpu.models.layers import ConvolutionFrontEnd, swish
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.models.transformer import (
    NormalizedEmbedding,
    TransformerDecoder,
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
    lengths_to_padding_mask,
    make_chunked_src_mask,
    sinusoidal_position_encoding,
)
from mamba_asr_tpu.models.attention import rel_pos_encoding

Array = jax.Array

def _gelu_exact(x: Array) -> Array:
    """Exact (erf) GELU — torch.nn.GELU's default, which every reference
    config uses (activation: !name:torch.nn.GELU); flax's default is the
    tanh approximation, which would break imported-checkpoint parity."""
    return nn.gelu(x, approximate=False)


def _gelu_tanh(x: Array) -> Array:
    """Tanh-approximate GELU — ~10x cheaper than erf on the TPU VPU
    (measured 21.7 vs 219.8 us/op over 12.3M bf16 elements; max abs
    deviation from exact GELU ~5e-4, well under bf16 activation
    noise). Opt-in via `activation: gelu_tanh`; the default stays
    erf-exact so imported reference checkpoints match bit-for-bit."""
    return nn.gelu(x, approximate=True)


_ACTIVATIONS = {
    "gelu": _gelu_exact,
    "gelu_tanh": _gelu_tanh,
    "relu": nn.relu,
    "swish": swish,
    "silu": swish,
}


@dataclasses.dataclass(frozen=True)
class ASRConfig:
    """Model hyperparameters (mirrors the reference yaml model stanzas)."""

    vocab_size: int = 31
    n_mels: int = 80
    d_model: int = 256
    nhead: int = 4
    num_encoder_layers: int = 18
    num_decoder_layers: int = 0
    d_ffn: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    # transformer | conformer | conmamba | branchformer
    encoder_module: str = "conmamba"
    decoder_module: str = "transformer"  # transformer | mamba
    # Branchformer cgMLP surface (TransformerASR.py:700-702 defaults;
    # the reference's branchformer path is aspirational — see
    # models/branchformer.py).
    csgu_linear_units: int = 3072
    gate_activation: str = "identity"
    use_linear_after_conv: bool = False
    # RelPosMHAXL | regularMHA | hypermixing (the reference's full
    # attention allowlist, Transformer.py:669). hypermixing is global
    # token mixing — incompatible with causal/streaming encoders.
    attention_type: str = "RelPosMHAXL"
    positional_encoding: str = "fixed_abs_sine"
    kernel_size: int = 31
    bias: bool = True
    causal: bool = False
    max_length: int = 2500
    # Conv frontend (4x time downsampling).
    frontend_channels: Tuple[int, ...] = (64, 32)
    frontend_strides: Tuple[int, ...] = (2, 2)
    # Mamba mixer config.
    mamba: MambaConfig = MambaConfig()
    bidirectional: bool = True
    # nn.scan over encoder layers: O(1)-depth compile time, stacked
    # parameter layout. Streaming (init_streaming_state/encode_chunk)
    # works in BOTH layouts — scanned stacks scan the per-layer
    # streaming state alongside the stacked params (models/stacking.py).
    scan_layers: bool = False
    # Recompute encoder-layer activations in the backward pass (with
    # scan_layers): trades ~30% step time for O(1)-in-depth activation
    # memory — required for long sequences (ConMamba Large at batch
    # 8 x 60 s OOMs without it).
    remat_layers: bool = False
    # Compute dtype for the network ("float32" | "bfloat16").
    compute_dtype: str = "float32"
    xavier_parity_init: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def frontend_output_dim(self) -> int:
        f = self.n_mels
        for s in self.frontend_strides:
            f = -(-f // s)
        return f * self.frontend_channels[-1]

    @property
    def downsample(self) -> int:
        d = 1
        for s in self.frontend_strides:
            d *= s
        return d

    def activation_fn(self) -> Callable[[Array], Array]:
        return _ACTIVATIONS[self.activation]


class ASRModel(nn.Module):
    """feats (B, T, n_mels) -> encoder states, CTC logits, S2S logits."""

    cfg: ASRConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        act = cfg.activation_fn()

        self.frontend = ConvolutionFrontEnd(
            out_channels=cfg.frontend_channels,
            kernel_sizes=tuple(3 for _ in cfg.frontend_channels),
            strides=cfg.frontend_strides,
            dropout=cfg.dropout,
            dtype=dtype,
            name="frontend",
        )
        self.src_proj = nn.Dense(cfg.d_model, dtype=dtype, name="src_proj")
        self.src_drop = nn.Dropout(cfg.dropout)

        if cfg.encoder_module == "conmamba":
            self.encoder = ConmambaEncoder(
                num_layers=cfg.num_encoder_layers,
                d_model=cfg.d_model,
                d_ffn=cfg.d_ffn,
                kernel_size=cfg.kernel_size,
                activation=act,
                bias=cfg.bias,
                dropout=cfg.dropout,
                causal=cfg.causal,
                mamba_cfg=cfg.mamba,
                bidirectional=cfg.bidirectional,
                scan_layers=cfg.scan_layers,
                remat_layers=cfg.remat_layers,
                dtype=dtype,
                name="encoder",
            )
        elif cfg.encoder_module == "conformer":
            self.encoder = ConformerEncoder(
                num_layers=cfg.num_encoder_layers,
                d_model=cfg.d_model,
                d_ffn=cfg.d_ffn,
                nhead=cfg.nhead,
                kernel_size=cfg.kernel_size,
                activation=act,
                bias=cfg.bias,
                dropout=cfg.dropout,
                causal=cfg.causal,
                attention_type=cfg.attention_type,
                scan_layers=cfg.scan_layers,
                remat_layers=cfg.remat_layers,
                dtype=dtype,
                name="encoder",
            )
        elif cfg.encoder_module == "branchformer":
            from mamba_asr_tpu.models.branchformer import BranchformerEncoder

            self.encoder = BranchformerEncoder(
                num_layers=cfg.num_encoder_layers,
                d_model=cfg.d_model,
                nhead=cfg.nhead,
                kernel_size=cfg.kernel_size,
                csgu_linear_units=cfg.csgu_linear_units,
                use_linear_after_conv=cfg.use_linear_after_conv,
                gate_activation=cfg.gate_activation,
                activation=act,
                dropout=cfg.dropout,
                causal=cfg.causal,
                attention_type=cfg.attention_type,
                scan_layers=cfg.scan_layers,
                remat_layers=cfg.remat_layers,
                dtype=dtype,
                name="encoder",
            )
        elif cfg.encoder_module == "transformer":
            self.encoder = TransformerEncoder(
                num_layers=cfg.num_encoder_layers,
                d_ffn=cfg.d_ffn,
                nhead=cfg.nhead,
                dropout=cfg.dropout,
                activation=act,
                normalize_before=True,
                attention_type=cfg.attention_type,
                dtype=dtype,
                name="encoder",
            )
        else:
            raise ValueError(f"unknown encoder_module {cfg.encoder_module}")

        if cfg.num_decoder_layers > 0:
            self.tgt_embed = NormalizedEmbedding(
                cfg.vocab_size, cfg.d_model, dtype=dtype, name="tgt_embed"
            )
            # Every reference S2S config builds its decoder pre-LN
            # (normalize_before: True, e.g.
            # /root/reference/hparams/S2S/conmamba_large.yaml:281 ->
            # Transformer.py:765-789), with the stack's final LN applied
            # unconditionally (Transformer.py:1644, Conmamba.py:1028).
            if cfg.decoder_module == "mamba":
                self.decoder = MambaDecoder(
                    num_layers=cfg.num_decoder_layers,
                    d_model=cfg.d_model,
                    d_ffn=cfg.d_ffn,
                    activation=act,
                    dropout=cfg.dropout,
                    normalize_before=True,
                    mamba_cfg=cfg.mamba,
                    dtype=dtype,
                    name="decoder",
                )
            elif cfg.decoder_module == "transformer":
                self.decoder = TransformerDecoder(
                    num_layers=cfg.num_decoder_layers,
                    d_ffn=cfg.d_ffn,
                    nhead=cfg.nhead,
                    dropout=cfg.dropout,
                    activation=act,
                    normalize_before=True,
                    dtype=dtype,
                    name="decoder",
                )
            elif cfg.decoder_module == "conformer":
                # Cross-attention + causal-conv decoder
                # (/root/reference/modules/Conformer.py:2178-2479 —
                # unreachable from the reference's own configs; wired
                # here as a first-class option).
                from mamba_asr_tpu.models.conformer import ConformerDecoder

                self.decoder = ConformerDecoder(
                    num_layers=cfg.num_decoder_layers,
                    d_model=cfg.d_model,
                    d_ffn=cfg.d_ffn,
                    nhead=cfg.nhead,
                    kernel_size=cfg.kernel_size,
                    activation=act,
                    bias=cfg.bias,
                    dropout=cfg.dropout,
                    dtype=dtype,
                    name="decoder",
                )
            else:
                raise ValueError(f"unknown decoder_module {cfg.decoder_module}")
            self.seq_head = nn.Dense(
                cfg.vocab_size, dtype=jnp.float32, name="seq_head"
            )

        self.ctc_head = nn.Dense(
            cfg.vocab_size, dtype=jnp.float32, name="ctc_head"
        )

    # -- encoder ----------------------------------------------------------

    def encode_pre(
        self,
        feats: Array,
        feat_lengths: Optional[Array] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        """Frontend + projection only: feats (B, T, n_mels) ->
        (x (B, T', d_model), enc_lengths). The split point for running
        the encoder stack under sequence/pipeline parallelism
        (parallel/encoder_parallel.py); `encode` == encode_pre + the
        stack dispatch below."""
        cfg = self.cfg
        x = self.frontend(feats, train=train)  # (B, T', F', C)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = self.src_proj(x)
        x = self.src_drop(x, deterministic=not train)
        from mamba_asr_tpu.parallel.mesh import constrain_batch

        x = constrain_batch(x)
        if feat_lengths is not None:
            enc_lengths = -(-feat_lengths // cfg.downsample)  # ceil div
        else:
            enc_lengths = jnp.full((b,), t, jnp.int32)
        return x, enc_lengths

    def encode(
        self,
        feats: Array,
        feat_lengths: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        left_context_chunks: Optional[int] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        """feats (B, T, n_mels) -> (enc_out (B, T', d_model), enc_lengths)."""
        cfg = self.cfg
        x, enc_lengths = self.encode_pre(feats, feat_lengths, train=train)
        b, t = x.shape[0], x.shape[1]
        pad_mask = lengths_to_padding_mask(enc_lengths, t)

        src_mask = None
        if chunk_size is not None:
            src_mask = make_chunked_src_mask(t, chunk_size, left_context_chunks)

        if cfg.encoder_module == "conmamba":
            enc = self.encoder(
                x, src_key_padding_mask=pad_mask, chunk_size=chunk_size,
                train=train,
            )
        elif cfg.encoder_module == "conformer":
            # hypermixing adds its own internal PE; no external pos_embs
            # (reference dispatch TransformerASR.py:775-781).
            pos = (
                None if cfg.attention_type == "hypermixing"
                else rel_pos_encoding(t, cfg.d_model, dtype=x.dtype)
            )
            enc, _ = self.encoder(
                x, src_mask=src_mask, src_key_padding_mask=pad_mask,
                pos_embs=pos, chunk_size=chunk_size, train=train,
            )
        elif cfg.encoder_module == "branchformer":
            if cfg.attention_type == "RelPosMHAXL":
                pos = rel_pos_encoding(t, cfg.d_model, dtype=x.dtype)
            elif cfg.attention_type == "hypermixing":
                pos = None  # HyperMixing applies its own internal PE
            else:
                x = x + sinusoidal_position_encoding(t, cfg.d_model, x.dtype)
                pos = None
            # Dynamic-chunk training: chunked attention via src_mask,
            # chunked CSGU conv via chunk_size (shared DCConv).
            enc, _ = self.encoder(
                x, src_mask=src_mask, src_key_padding_mask=pad_mask,
                pos_embs=pos, chunk_size=chunk_size, train=train,
            )
        else:  # transformer
            if cfg.attention_type == "RelPosMHAXL":
                pos = rel_pos_encoding(t, cfg.d_model, dtype=x.dtype)
            elif cfg.attention_type == "hypermixing":
                pos = None  # HyperMixing applies its own internal PE
            else:
                x = x + sinusoidal_position_encoding(t, cfg.d_model, x.dtype)
                pos = None
            enc, _ = self.encoder(
                x, src_mask=src_mask, src_key_padding_mask=pad_mask,
                pos_embs=pos, train=train,
            )
        return enc, enc_lengths

    # -- decoder ----------------------------------------------------------

    def decode(
        self,
        tokens: Array,
        enc_out: Array,
        enc_lengths: Optional[Array] = None,
        pad_idx: int = 0,
        train: bool = False,
    ) -> Array:
        """tokens (B, S) -> decoder states (B, S, d_model)."""
        cfg = self.cfg
        s = tokens.shape[1]
        tgt = self.tgt_embed(tokens)
        # Decoder positional encoding: fixed sinusoidal added to tgt
        # regardless of encoder attention type (TransformerASR.py:793-806).
        tgt = tgt + sinusoidal_position_encoding(s, cfg.d_model, tgt.dtype)
        if cfg.decoder_module == "mamba":
            return self.decoder(tgt, enc_out, train=train)
        if cfg.decoder_module == "conformer":
            mem_kpm = (
                lengths_to_padding_mask(enc_lengths, enc_out.shape[1])
                if enc_lengths is not None
                else None
            )
            dec, _ = self.decoder(
                tgt, enc_out, memory_key_padding_mask=mem_kpm, train=train
            )
            return dec
        tgt_mask = get_lookahead_mask(s)
        tgt_kpm = get_key_padding_mask(tokens, pad_idx) if train else None
        mem_kpm = (
            lengths_to_padding_mask(enc_lengths, enc_out.shape[1])
            if enc_lengths is not None
            else None
        )
        dec, _, _ = self.decoder(
            tgt, enc_out,
            tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_kpm,
            memory_key_padding_mask=mem_kpm,
            train=train,
        )
        return dec

    # -- streaming encode ---------------------------------------------------

    def init_streaming_state(self, batch: int):
        """Per-layer carried state for chunked streaming encode —
        the reference's make_streaming_context
        (/root/reference/modules/TransformerASR.py:1024-1049), extended to
        ConMamba (carried SSM state + conv tails), which the reference
        documents but never implemented (SURVEY.md §3.3), and to the
        Branchformer (left attention context + CSGU conv tail)."""
        assert self.cfg.encoder_module in (
            "conmamba", "conformer", "branchformer",
        )
        return self.encoder.init_stream_state(batch, self.cfg.dtype)

    def encode_chunk(self, feats: Array, state):
        """One chunk of normalized features (B, T_chunk, n_mels) ->
        (enc_out_chunk, new_state). The conv frontend is applied
        per-chunk (the granularity of the reference's streaming wrapper).
        """
        x = self.frontend(feats, train=False)
        b, t, f, c = x.shape
        x = self.src_proj(x.reshape(b, t, f * c))
        return self.encoder.forward_chunk(x, state)

    # -- stateful decoder cache (O(1)-per-token decode) ----------------------

    def init_decoder_cache(self, batch: int, s_max: Optional[int] = None,
                           beam_gather: bool = False):
        """Mamba decoder: per-layer (conv_state, ssm_state). Transformer
        decoder: per-layer self-attention KV buffers of length `s_max`
        (+ cross K/V filled by priming); `beam_gather` selects the
        append-only ancestor-mask layout (attention.py)."""
        if self.cfg.decoder_module == "mamba":
            return self.decoder.init_cache(batch, self.cfg.dtype)
        assert s_max is not None, "transformer decoder cache needs s_max"
        return self.decoder.init_cache(
            batch, s_max, self.cfg.d_model, self.cfg.dtype,
            beam_gather=beam_gather,
        )

    def prime_decoder_cache(self, enc_out: Array, cache,
                            enc_lengths: Optional[Array] = None):
        """Mamba: scan the encoder memory into every layer's cross-mamba
        state. Transformer: project the memory into per-layer cross K/V.
        Either way the per-step decode never re-touches the memory
        (replaces the reference's full-prefix re-scan per decode step,
        SURVEY.md §3.2)."""
        if self.cfg.decoder_module == "mamba":
            return self.decoder.prime_cache(enc_out, cache)
        mem_kpm = (
            lengths_to_padding_mask(enc_lengths, enc_out.shape[1])
            if enc_lengths is not None
            else None
        )
        return self.decoder.prime_cache(
            enc_out, cache, memory_key_padding_mask=mem_kpm
        )

    def extend_decoder_cache(self, enc_chunk: Array, cache):
        """Advance every cross-mamba state with a further chunk of
        encoder memory — pure-SSM long-form streaming: new audio only
        ever *extends* state, nothing is recomputed (BASELINE config 5)."""
        return self.decoder.extend_cache(enc_chunk, cache)

    def decode_step(self, token_t: Array, pos: Array, cache,
                    anc: Optional[Array] = None):
        """One decode step. token_t (B,) int32, pos scalar position.

        Returns (raw seq-head logits (B, V), new_cache). `anc`
        (transformer decoder only) selects append-only beam-gather
        self-attention caches (attention.py)."""
        tgt = self.tgt_embed(token_t[:, None])[:, 0]
        pe = sinusoidal_position_encoding(
            self.cfg.max_length, self.cfg.d_model, tgt.dtype
        )
        tgt = tgt + pe[pos]
        if self.cfg.decoder_module == "mamba":
            dec, cache = self.decoder.step(tgt, cache)
        else:
            dec, cache = self.decoder.step(tgt, pos, cache,
                                           anc=anc)
        logits = self.seq_head(dec.astype(jnp.float32))
        return logits, cache

    # -- heads & full forward ----------------------------------------------

    def __call__(
        self,
        feats: Array,
        feat_lengths: Optional[Array] = None,
        tokens_bos: Optional[Array] = None,
        pad_idx: int = 0,
        chunk_size: Optional[int] = None,
        left_context_chunks: Optional[int] = None,
        train: bool = False,
    ):
        """Full forward: returns dict with enc_out, enc_lengths,
        ctc_log_probs, and (if decoding) seq_log_probs."""
        enc, enc_lengths = self.encode(
            feats, feat_lengths, chunk_size, left_context_chunks, train=train
        )
        return self.forward_from_enc(
            enc, enc_lengths, tokens_bos, pad_idx=pad_idx, train=train
        )

    def forward_from_enc(
        self,
        enc: Array,
        enc_lengths: Array,
        tokens_bos: Optional[Array] = None,
        pad_idx: int = 0,
        train: bool = False,
    ):
        """Heads (+ decoder) given encoder output — the tail of the full
        forward, callable on its own when the encoder stack ran outside
        the module (sequence/pipeline-parallel training)."""
        ctc_logits = self.ctc_head(enc.astype(jnp.float32))
        out = {
            "enc_out": enc,
            "enc_lengths": enc_lengths,
            "ctc_log_probs": jax.nn.log_softmax(ctc_logits, axis=-1),
        }
        if tokens_bos is not None and self.cfg.num_decoder_layers > 0:
            dec = self.decode(
                tokens_bos, enc, enc_lengths, pad_idx=pad_idx, train=train
            )
            seq_logits = self.seq_head(dec.astype(jnp.float32))
            out["seq_log_probs"] = jax.nn.log_softmax(seq_logits, axis=-1)
        return out


class EncoderWrapper(nn.Module):
    """Encoder-only adapter: `__call__` IS `encode`, mirroring the
    reference's EncoderWrapper
    (/root/reference/modules/TransformerASR.py:1056-1105), whose forward
    delegates to `transformer.encode` and whose `forward_streaming` /
    `make_streaming_context` delegate to the streaming surface. Useful
    when a downstream pipeline wants a module whose plain application is
    the encoder (e.g. feature extraction / SSL-style probing)."""

    asr: ASRModel

    def __call__(
        self,
        feats: Array,
        feat_lengths: Optional[Array] = None,
        **kwargs,
    ) -> Tuple[Array, Array]:
        return self.asr.encode(feats, feat_lengths, **kwargs)

    def forward_streaming(self, feats: Array, state):
        """One normalized feature chunk through the streaming encoder,
        carrying `state` (TransformerASR.py:1092-1096)."""
        return self.asr.encode_chunk(feats, state)

    def make_streaming_context(self, batch: int):
        """Fresh per-layer streaming state (TransformerASR.py:1098-1105)."""
        return self.asr.init_streaming_state(batch)
