"""Sequence-parallel ops vs the unsharded oracles on an 8-device mesh.

The time axis of the activations is sharded over a ("seq",) mesh with
jax.shard_map; sp_selective_scan / sp_causal_conv1d must reproduce the
unsharded ops exactly (values AND gradients) in both directions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mamba_asr_tpu.ops.causal_conv1d import causal_conv1d
from mamba_asr_tpu.ops.selective_scan import selective_scan
from mamba_asr_tpu.parallel.sequence import (
    sp_causal_conv1d,
    sp_selective_scan,
)

N_DEV = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("seq",))


def _scan_inputs(b=2, t=64, d=8, n=4, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(b, t, d)) * 0.5, jnp.float32)
    delta = jnp.asarray(rng.normal(size=(b, t, d)) * 0.3, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32) * 0.3)
    B = jnp.asarray(rng.normal(size=(b, t, n)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(b, t, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    dtb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    return u, delta, A, B, C, D, z, dtb


@pytest.mark.parametrize("reverse", [False, True])
def test_sp_selective_scan_matches_unsharded(reverse):
    mesh = _mesh()
    u, delta, A, B, C, D, z, dtb = _scan_inputs()

    def sharded(u, delta, B, C, z):
        return sp_selective_scan(
            u, delta, A, B, C, D, z, dtb, delta_softplus=True,
            return_last_state=True, axis_name="seq", reverse=reverse,
        )

    spec_t = P(None, "seq", None)
    f = jax.jit(
        jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(spec_t,) * 5,
            out_specs=(spec_t, P()),
        )
    )
    out_sp, h_sp = f(u, delta, B, C, z)

    if reverse:
        ref_out, ref_h = selective_scan(
            u[:, ::-1], delta[:, ::-1], A, B[:, ::-1], C[:, ::-1], D,
            z[:, ::-1], dtb, delta_softplus=True, return_last_state=True,
        )
        ref_out = ref_out[:, ::-1]
    else:
        ref_out, ref_h = selective_scan(
            u, delta, A, B, C, D, z, dtb, delta_softplus=True,
            return_last_state=True,
        )
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(ref_out), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_sp), np.asarray(ref_h), rtol=2e-4, atol=2e-5
    )


def test_sp_selective_scan_with_h0():
    mesh = _mesh()
    u, delta, A, B, C, D, z, dtb = _scan_inputs(seed=3)
    rng = np.random.default_rng(9)
    h0 = jnp.asarray(
        rng.normal(size=(u.shape[0], u.shape[2], A.shape[1])) * 0.3,
        jnp.float32,
    )

    def sharded(u, delta, B, C, z):
        return sp_selective_scan(
            u, delta, A, B, C, D, z, dtb, delta_softplus=True, h0=h0,
            return_last_state=True, axis_name="seq",
        )

    spec_t = P(None, "seq", None)
    f = jax.jit(
        jax.shard_map(
            sharded, mesh=mesh, in_specs=(spec_t,) * 5,
            out_specs=(spec_t, P()),
        )
    )
    out_sp, h_sp = f(u, delta, B, C, z)
    ref_out, ref_h = selective_scan(
        u, delta, A, B, C, D, z, dtb, delta_softplus=True, h0=h0,
        return_last_state=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(ref_out), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_sp), np.asarray(ref_h), rtol=2e-4, atol=2e-5
    )


def test_sp_selective_scan_gradients_match():
    mesh = _mesh()
    u, delta, A, B, C, D, z, dtb = _scan_inputs(seed=1)
    spec_t = P(None, "seq", None)

    def sp_loss(u, delta, B, C, z):
        def body(u, delta, B, C, z):
            y = sp_selective_scan(
                u, delta, A, B, C, D, z, dtb, delta_softplus=True,
                axis_name="seq",
            )
            # Per-shard partial of a global sum-of-squares.
            return jax.lax.psum(jnp.sum(y * y), "seq")

        return jax.shard_map(
            body, mesh=mesh, in_specs=(spec_t,) * 5, out_specs=P()
        )(u, delta, B, C, z)

    def ref_loss(u, delta, B, C, z):
        y = selective_scan(
            u, delta, A, B, C, D, z, dtb, delta_softplus=True
        )
        return jnp.sum(y * y)

    v_sp, g_sp = jax.jit(
        jax.value_and_grad(sp_loss, argnums=(0, 1, 2, 3, 4))
    )(u, delta, B, C, z)
    v_rf, g_rf = jax.jit(
        jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3, 4))
    )(u, delta, B, C, z)
    np.testing.assert_allclose(float(v_sp), float(v_rf), rtol=1e-5)
    for gs, gr in zip(g_sp, g_rf):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=3e-4, atol=3e-5
        )


def test_bimamba_block_sequence_parallel_matches():
    """BiMambaBlock with cfg.seq_axis under shard_map == plain block:
    identical params, identical outputs and parameter gradients."""
    from mamba_asr_tpu.models.mamba import BiMambaBlock, MambaConfig

    mesh = _mesh()
    b, t, d_model = 2, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, d_model)), jnp.float32)

    plain = BiMambaBlock(
        d_model, MambaConfig(d_state=4, scan_impl="xla")
    )
    sp = BiMambaBlock(
        d_model,
        MambaConfig(d_state=4, scan_impl="xla", seq_axis="seq"),
    )
    params = plain.init(jax.random.PRNGKey(0), x)

    def ref_loss(params, x):
        y = plain.apply(params, x)
        return jnp.sum(y * y), y

    spec_t = P(None, "seq", None)

    def sp_loss(params, x):
        def body(params, x):
            y = sp.apply(params, x)
            return jax.lax.psum(jnp.sum(y * y), "seq"), y

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(), spec_t),
            out_specs=(P(), spec_t),
        )(params, x)

    (v_rf, y_rf), g_rf = jax.jit(
        jax.value_and_grad(ref_loss, has_aux=True)
    )(params, x)
    (v_sp, y_sp), g_sp = jax.jit(
        jax.value_and_grad(sp_loss, has_aux=True)
    )(params, x)

    np.testing.assert_allclose(float(v_sp), float(v_rf), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(y_sp), np.asarray(y_rf), rtol=2e-4, atol=2e-5
    )
    flat_rf = jax.tree_util.tree_leaves_with_path(g_rf)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    for (path, gr), gs in zip(flat_rf, flat_sp):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("causal", [False, True])
def test_conmamba_encoder_sequence_parallel_matches(causal):
    """A full ConMamba encoder (FFN macaron + BiMamba + ConvModule + LN
    stack) with mamba_cfg.seq_axis under shard_map == the plain encoder:
    the conv module exchanges halos, the scans chain state."""
    from mamba_asr_tpu.models.conmamba import ConmambaEncoder
    from mamba_asr_tpu.models.mamba import MambaConfig

    mesh = _mesh()
    b, t, d_model = 2, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, d_model)), jnp.float32)

    kw = dict(
        num_layers=2, d_model=d_model, d_ffn=16, kernel_size=7,
        dropout=0.0, causal=causal, bidirectional=not causal,
    )
    plain = ConmambaEncoder(
        mamba_cfg=MambaConfig(d_state=4, scan_impl="xla"), **kw
    )
    sp = ConmambaEncoder(
        mamba_cfg=MambaConfig(d_state=4, scan_impl="xla", seq_axis="seq"),
        **kw,
    )
    params = plain.init(jax.random.PRNGKey(0), x)

    def ref_loss(params, x):
        y = plain.apply(params, x)
        return jnp.sum(y * y), y

    spec_t = P(None, "seq", None)

    def sp_loss(params, x):
        def body(params, x):
            y = sp.apply(params, x)
            return jax.lax.psum(jnp.sum(y * y), "seq"), y

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(), spec_t),
            out_specs=(P(), spec_t),
        )(params, x)

    (v_rf, y_rf), g_rf = jax.jit(
        jax.value_and_grad(ref_loss, has_aux=True)
    )(params, x)
    (v_sp, y_sp), g_sp = jax.jit(
        jax.value_and_grad(sp_loss, has_aux=True)
    )(params, x)

    np.testing.assert_allclose(float(v_sp), float(v_rf), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(y_sp), np.asarray(y_rf), rtol=3e-4, atol=3e-5
    )
    for (path, gr), gs in zip(
        jax.tree_util.tree_leaves_with_path(g_rf),
        jax.tree_util.tree_leaves(g_sp),
    ):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("k", [1, 4])
def test_sp_causal_conv1d_matches_unsharded(reverse, k):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    b, t, d = 2, 64, 6
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(d,)), jnp.float32)

    def sharded(x):
        return sp_causal_conv1d(
            x, w, bias, activation="silu", axis_name="seq",
            reverse=reverse,
        )

    spec_t = P(None, "seq", None)
    f = jax.jit(
        jax.shard_map(sharded, mesh=mesh, in_specs=(spec_t,),
                      out_specs=spec_t)
    )
    out_sp = f(x)
    if reverse:
        ref = causal_conv1d(x[:, ::-1], w, bias, "silu")[:, ::-1]
    else:
        ref = causal_conv1d(x, w, bias, "silu")
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
