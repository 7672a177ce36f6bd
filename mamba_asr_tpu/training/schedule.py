"""LR schedules: Noam warmup (SpeechBrain-compatible normalization).

Reference: speechbrain.nnet.schedulers.NoamScheduler configured at
/root/reference/hparams/CTC/conmamba_large.yaml:243-246 —
lr(step) = lr_initial * sqrt(warmup) * min(step^-0.5, step * warmup^-1.5),
so lr peaks at exactly lr_initial at step == warmup.

Quirk preserved as an option: the reference's S2S driver steps the
scheduler twice per optimizer step (/root/reference/train_S2S.py:871-874),
i.e. the effective schedule uses 2x the step count — pass
`steps_per_update=2` to reproduce.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(
    lr_initial: float, warmup_steps: int, steps_per_update: int = 1
) -> optax.Schedule:
    norm = warmup_steps**0.5

    def schedule(count):
        step = jnp.maximum(count * steps_per_update, 1).astype(jnp.float32)
        return lr_initial * norm * jnp.minimum(
            step**-0.5, step * warmup_steps**-1.5
        )

    return schedule
