"""Convert encoder parameter layouts: scanned (stacked) <-> unrolled.

`scan_layers=True` stacks every layer parameter along a leading depth
axis (one nn.scan body); `scan_layers=False` keeps per-layer subtrees
`layer_0..layer_{N-1}`. Checkpoints trained in one layout convert to
the other with these utilities. (Streaming works in both layouts —
models/stacking.py scans the per-layer streaming state alongside the
stacked params — so conversion is only needed to move checkpoints
between differently-configured experiments.)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _find_stack(encoder_params: Dict):
    stack = encoder_params["stack"]["layers"]
    (inner_key,) = stack.keys()  # the scan Body's single child layer
    return stack[inner_key], inner_key


def scanned_to_unrolled(encoder_params: Dict, num_layers: int) -> Dict:
    """Encoder subtree with {'stack': ...} -> {'layer_i': ...} layout."""
    stacked, _ = _find_stack(encoder_params)
    out = {
        k: v for k, v in encoder_params.items() if k != "stack"
    }
    for i in range(num_layers):
        out[f"layer_{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked
        )
    return out


def unrolled_to_scanned(
    encoder_params: Dict, num_layers: int,
    inner_key: str = "ConmambaEncoderLayer_0",
) -> Dict:
    """Encoder subtree with {'layer_i': ...} -> {'stack': ...} layout."""
    per_layer = [encoder_params[f"layer_{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer
    )
    out = {
        k: v
        for k, v in encoder_params.items()
        if not k.startswith("layer_")
    }
    out["stack"] = {"layers": {inner_key: stacked}}
    return out


def convert_encoder_layout(
    params: Dict, num_layers: int, to_scanned: bool,
    encoder_name: str = "encoder",
    inner_key: str = "ConmambaEncoderLayer_0",
) -> Dict:
    """Convert a full ASRModel params tree between layouts."""
    params = dict(params)
    enc = dict(params[encoder_name])
    if to_scanned:
        params[encoder_name] = unrolled_to_scanned(enc, num_layers, inner_key)
    else:
        params[encoder_name] = scanned_to_unrolled(enc, num_layers)
    return params
