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
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def template_stream_state(layer_cls, layer_kwargs: dict, batch: int, dtype):
    """One layer's streaming-state pytree, computed WITHOUT params.

    A bound template submodule can't do this: merely touching it runs
    its setup(), which declares params that don't exist in apply mode.
    Instead we eval_shape the layer's own init path — `parent=None`
    detaches the instance from the enclosing module context, and under
    eval_shape the init costs nothing — then materialise zeros."""
    one = layer_cls(**layer_kwargs, parent=None)
    shapes = jax.eval_shape(
        lambda: one.init_with_output(
            jax.random.PRNGKey(0), batch, dtype,
            method=layer_cls.init_stream_state,
        )[0]
    )
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )


def scanned_stream_state(layer_cls, layer_kwargs: dict, num_layers: int,
                         batch: int, dtype):
    """Initial streaming state for a ScannedStack: the single-layer
    template state stacked to (B, num_layers, ...) per leaf."""
    return stack_stream_state(
        template_stream_state(layer_cls, layer_kwargs, batch, dtype),
        num_layers,
    )


def stack_stream_state(one_layer_state, num_layers: int):
    """Stack one layer's streaming state for a scanned stack.

    Layout stays batch-leading — (B, num_layers, ...) per leaf — so
    engines that slice/mask the batch axis (serving slot batch, session
    transplant) treat scanned and unrolled states identically."""
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(
            a[:, None], (a.shape[0], num_layers) + a.shape[1:]
        ),
        one_layer_state,
    )


def stream_chunk_scanned(stack, x: Array, state):
    """One streaming chunk through a ScannedStack: swap the state to
    depth-leading for the scan, back to batch-leading for the caller."""
    swap = lambda a: jnp.swapaxes(a, 0, 1)  # noqa: E731
    st = jax.tree_util.tree_map(swap, state)
    out, st2 = stack(x, stream_state=st)
    return out, jax.tree_util.tree_map(swap, st2)


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
    def __call__(self, x: Array, *extras, stream_state=None, **kw):
        layer_cls = self.layer_cls

        if stream_state is not None:
            # Streaming chunk over the whole stack in ONE scanned body:
            # the per-layer streaming state rides as the scanned
            # input/output (leading axis = depth, matching the stacked
            # params), the activation as the carry. Compile stays O(1)
            # in depth — serving a 12-layer streaming encoder over the
            # remote-compile tunnel is impossible unrolled (the HLO
            # upload exceeds the endpoint's request-size limit).
            class StreamBody(nn.Module):
                layer_kwargs: dict

                @nn.compact
                def __call__(self, carry, s):
                    return layer_cls(**self.layer_kwargs).forward_chunk(
                        carry, s
                    )

            scan = nn.scan(
                StreamBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
            )
            return scan(self.layer_kwargs, name="layers")(x, stream_state)

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
