"""Pallas fused selective-scan kernel (forward path).

Replaces the reference's `selective_scan_cuda.fwd` + `causal_conv1d_fwd`
pair (/root/reference/modules/mamba/selective_scan_interface.py:160-294):
the depthwise causal conv prologue, input projections, discretization,
first-order linear recurrence, output contraction, and silu gating are
fused into a single VMEM-resident pipeline so the (B, L, D, N)
intermediates never touch HBM.

Kernel layout (see docstring of selective_scan_pallas): grid over
(batch, d_inner tiles), sequential over length chunks; the running state
h (d_tile, N) lives in a VMEM scratch accumulator carried across chunks.
Within a chunk the recurrence is evaluated with a log-depth
associative-scan (doubling) over the chunk axis.

Status: implemented incrementally — `supported()` gates dispatch so the
XLA associative-scan path (selective_scan_xla) is used whenever the
kernel does not cover a configuration.
"""

from __future__ import annotations

from typing import Optional

import jax

Array = jax.Array


def supported(u: Array, A: Array, h0, return_last_state: bool) -> bool:
    """Whether the Pallas kernel covers this config on this backend."""
    del u, A
    if h0 is not None or return_last_state:
        return False
    # Forward kernel lands later in this round; dispatch falls back to the
    # XLA associative scan until then.
    return False


def selective_scan_pallas(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
) -> Array:
    raise NotImplementedError("gated by supported(); use selective_scan_xla")
