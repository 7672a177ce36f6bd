"""Shared nn.scan layer-stack wrapper for the deep encoders.

One traced layer body, `num_layers` stacked parameter slices — compile
time O(1) in depth (vs O(depth) for an unrolled stack; deep encoders
compile 10x+ faster over this environment's remote-compile tunnel).
Used by the ConMamba, Conformer, and Branchformer encoders; the
parameter tree it produces (`stack/layers/<LayerCls>_0/...` with a
leading depth axis on every leaf) is what `models/params_convert.py`
converts to/from the unrolled `layer_i` layout.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

Array = jax.Array


class ScannedStack(nn.Module):
    """nn.scan over `num_layers` instances of `layer_cls`.

    Extra positional/keyword arguments of `__call__` are broadcast to
    every layer (closed over, not scanned). A layer returning a tuple
    contributes its first element as the carry (per-layer aux outputs
    such as attention maps are dropped under scan).

    remat: recompute layer activations in the backward instead of
    saving them — nn.scan otherwise keeps every layer's residuals
    live, which OOMs long sequences (ConMamba Large at batch 8 x 60 s
    asks 18.7 GB without it).
    """

    layer_cls: Any  # static: the flax layer class
    num_layers: int
    layer_kwargs: dict
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array, *extras, **kw) -> Array:
        layer_cls = self.layer_cls

        class Body(nn.Module):
            layer_kwargs: dict

            @nn.compact
            def __call__(self, carry, _):
                out = layer_cls(**self.layer_kwargs)(carry, *extras, **kw)
                if isinstance(out, tuple):
                    out = out[0]
                return out, None

        body = nn.remat(Body, prevent_cse=False) if self.remat else Body
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
        )
        out, _ = scan(self.layer_kwargs, name="layers")(x, None)
        return out
