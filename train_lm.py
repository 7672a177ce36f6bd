#!/usr/bin/env python
"""Train the Transformer language model used for decode-time fusion.

The reference *downloads* a pretrained TransformerLM from HuggingFace
(/root/reference/train_S2S.py:1235-1236); zero-egress deployments need a
native trainer, provided here. Trains next-token prediction on a text
corpus (one transcript per line, e.g. LibriSpeech normalized text or the
`wrd` column of the train CSV).

    python train_lm.py --corpus corpus.txt --tokenizer tok.json \
        --output results/lm [--d_model 768 --layers 12 ...]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--d_model", type=int, default=768)
    p.add_argument("--nhead", type=int, default=12)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--d_ffn", type=int, default=3072)
    p.add_argument("--seq_len", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=4000)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from mamba_asr_tpu.data.tokenizer import BOS_ID, EOS_ID, load_tokenizer
    from mamba_asr_tpu.models.lm import TransformerLM
    from mamba_asr_tpu.training.losses import kldiv_loss
    from mamba_asr_tpu.training.schedule import noam_schedule
    from mamba_asr_tpu.utils.profiling import StepTimer

    tok = load_tokenizer(args.tokenizer)
    os.makedirs(args.output, exist_ok=True)

    # Tokenize the whole corpus into one id stream with bos/eos markers.
    ids = []
    with open(args.corpus, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                ids.extend([BOS_ID] + tok.encode(line) + [EOS_ID])
    stream = np.asarray(ids, np.int32)
    print(f"corpus: {len(stream)} tokens, vocab {tok.vocab_size}")

    model = TransformerLM(
        vocab_size=tok.vocab_size,
        d_model=args.d_model,
        nhead=args.nhead,
        num_layers=args.layers,
        d_ffn=args.d_ffn,
        dropout=args.dropout,
    )
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(
        rng, jnp.zeros((1, args.seq_len), jnp.int32), train=False
    )
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(noam_schedule(args.lr, args.warmup), b1=0.9, b2=0.98,
                    eps=1e-9, weight_decay=0.01),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(prm):
            logits = model.apply(prm, batch[:, :-1], train=True,
                                 rngs={"dropout": rng})
            lp = jax.nn.log_softmax(logits, axis=-1)
            return kldiv_loss(lp, batch[:, 1:], reduction="mean")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng_np = np.random.default_rng(args.seed)
    timer = StepTimer()
    timer.start()
    n = len(stream) - args.seq_len - 1
    for step in range(1, args.steps + 1):
        starts = rng_np.integers(0, n, size=args.batch_size)
        batch = np.stack([stream[s : s + args.seq_len + 1] for s in starts])
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(batch),
            jax.random.fold_in(rng, step),
        )
        timer.mark()
        if step % args.log_every == 0:
            print(f"step {step} loss {float(loss):.4f} "
                  f"({timer.mean()*1000:.1f} ms/step, "
                  f"ppl {float(jnp.exp(loss)):.1f})", flush=True)
        if step % args.save_every == 0 or step == args.steps:
            path = os.path.join(args.output, "lm.msgpack")
            with open(path, "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(params)))
            print(f"saved {path}")


if __name__ == "__main__":
    main()
