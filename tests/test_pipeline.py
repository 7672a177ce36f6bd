"""Pipeline parallelism: the GPipe schedule must be EXACT — forward and
gradients equal to the sequential layer stack (up to fp associativity).

The reference has no pipeline parallelism (DDP only,
/root/reference/train_CTC.py:1062); these tests pin down the semantics of
the TPU-native extension in parallel/pipeline.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from mamba_asr_tpu.parallel.pipeline import (
    pipeline_apply,
    stage_from_layer_fn,
)


def _toy_layer_fn(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _toy_stack(n_layers, d, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(
            rng.normal(0, 0.5, size=(n_layers, d, d)), jnp.float32
        ),
        "b": jnp.asarray(rng.normal(0, 0.1, size=(n_layers, d)), jnp.float32),
    }


def _sequential(stacked, x):
    def body(h, p):
        return _toy_layer_fn(p, h), None

    y, _ = jax.lax.scan(body, x, stacked)
    return y


@pytest.mark.parametrize("n_micro", [1, 2, 4])
@pytest.mark.parametrize("pipe", [2, 4, 8])
def test_pipeline_toy_forward_exact(pipe, n_micro):
    n_layers, d, b = pipe * 2, 8, 4
    stacked = _toy_stack(n_layers, d)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(b, 3, d)), jnp.float32
    )
    ref = _sequential(stacked, x)

    mesh = Mesh(np.array(jax.devices()[:pipe]), ("pipe",))
    stage_fn = stage_from_layer_fn(_toy_layer_fn)

    @jax.jit
    def pp(stacked, x):
        return jax.shard_map(
            lambda sp, xx: pipeline_apply(stage_fn, sp, xx, n_micro),
            mesh=mesh,
            in_specs=(P("pipe"), P()),
            out_specs=P(),
        )(stacked, x)

    np.testing.assert_allclose(pp(stacked, x), ref, rtol=1e-6, atol=1e-6)


def test_pipeline_toy_grads_exact():
    pipe, n_micro = 4, 2
    n_layers, d, b = 8, 8, 4
    stacked = _toy_stack(n_layers, d)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(b, 3, d)), jnp.float32
    )
    tgt = jnp.asarray(
        np.random.default_rng(3).normal(size=(b, 3, d)), jnp.float32
    )

    def ref_loss(stacked, x):
        y = _sequential(stacked, x)
        return jnp.mean((y - tgt) ** 2)

    mesh = Mesh(np.array(jax.devices()[:pipe]), ("pipe",))
    stage_fn = stage_from_layer_fn(_toy_layer_fn)

    def pp_loss(stacked, x):
        def body(sp, xx, tt):
            y = pipeline_apply(stage_fn, sp, xx, n_micro)
            return jnp.mean((y - tt) ** 2)

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P("pipe"), P(), P()), out_specs=P()
        )(stacked, x, tgt)

    v_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss, argnums=(0, 1)))(
        stacked, x
    )
    v_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss, argnums=(0, 1)))(
        stacked, x
    )
    np.testing.assert_allclose(float(v_pp), float(v_ref), rtol=1e-6)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)


def test_pipeline_dp_pp_composed():
    """dp x pp: batch sharded over "data", layers over "pipe" — forward
    and param grads must still match the single-device stack (shard_map's
    transpose inserts the grad psum over "data" automatically)."""
    data, pipe, n_micro = 2, 4, 2
    n_layers, d, b = 4, 8, 8
    stacked = _toy_stack(n_layers, d, seed=4)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(b, 3, d)), jnp.float32
    )

    def ref_loss(stacked, x):
        y = _sequential(stacked, x)
        return jnp.mean(y * y)

    mesh = Mesh(
        np.array(jax.devices()[: data * pipe]).reshape(data, pipe),
        ("data", "pipe"),
    )
    stage_fn = stage_from_layer_fn(_toy_layer_fn)

    def pp_loss(stacked, x):
        def body(sp, xx):
            y = pipeline_apply(stage_fn, sp, xx, n_micro)
            # mean over the global batch: psum the local sum, divide by
            # the global element count (x is batch-sharded over "data").
            return jax.lax.psum(jnp.sum(y * y), "data") / (
                y.size * jax.lax.psum(1, "data")
            )

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("pipe"), P("data")),
            out_specs=P(),
        )(stacked, x)

    v_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(stacked, x)
    v_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(stacked, x)
    np.testing.assert_allclose(float(v_pp), float(v_ref), rtol=1e-6)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)


def test_pipeline_conmamba_stack_exact():
    """The real scanned ConMamba encoder body, pipelined over 4 stages:
    forward and gradient equal to the unsharded encoder.apply."""
    from mamba_asr_tpu.models.conmamba import (
        ConmambaEncoder,
        ConmambaEncoderLayer,
    )
    from mamba_asr_tpu.models.mamba import MambaConfig

    pipe, n_micro = 4, 2
    n_layers, d_model, b, t = 4, 8, 4, 12
    enc = ConmambaEncoder(
        num_layers=n_layers, d_model=d_model, d_ffn=16, kernel_size=3,
        dropout=0.0, mamba_cfg=MambaConfig(d_state=4, scan_impl="xla"),
        scan_layers=True,
    )
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(b, t, d_model)), jnp.float32
    )
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    # Stacked per-layer params live under stack/layers/<Body child>.
    (body_key,) = params["stack"]["layers"].keys()
    stacked = params["stack"]["layers"][body_key]

    layer = ConmambaEncoderLayer(
        d_model=d_model, d_ffn=16, kernel_size=3, dropout=0.0,
        mamba_cfg=MambaConfig(d_state=4, scan_impl="xla"),
    )

    def layer_fn(p, h):
        return layer.apply({"params": p}, h, None, train=False)

    def final_norm(p, h):
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        hn = (h - mu) * jax.lax.rsqrt(var + 1e-6)
        return hn * p["norm"]["scale"] + p["norm"]["bias"]

    def ref_loss(params, x):
        y = enc.apply({"params": params}, x)
        return jnp.mean(y * y)

    mesh = Mesh(np.array(jax.devices()[:pipe]), ("pipe",))
    stage_fn = stage_from_layer_fn(layer_fn)

    def pp_loss(params, x):
        stacked = params["stack"]["layers"][body_key]

        def body(sp, rest, xx):
            y = pipeline_apply(stage_fn, sp, xx, n_micro)
            y = final_norm(rest, y)
            return jnp.mean(y * y)

        rest = {"norm": params["norm"]}
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("pipe"), P(), P()),
            out_specs=P(),
        )(stacked, rest, x)

    v_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(params, x)
    v_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(params, x)
    np.testing.assert_allclose(float(v_pp), float(v_ref), rtol=1e-5)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-6)


def test_pipeline_with_remat_grads_exact():
    """jax.checkpoint-wrapped layers (the long-sequence memory lever,
    cf. model.remat_layers) must pipeline with exact gradients."""
    pipe, n_micro = 4, 2
    n_layers, d, b = 8, 8, 4
    stacked = _toy_stack(n_layers, d, seed=8)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(b, 3, d)), jnp.float32
    )

    def ref_loss(stacked, x):
        y = _sequential(stacked, x)
        return jnp.mean(y * y)

    mesh = Mesh(np.array(jax.devices()[:pipe]), ("pipe",))
    stage_fn = stage_from_layer_fn(jax.checkpoint(_toy_layer_fn))

    def pp_loss(stacked, x):
        def body(sp, xx):
            y = pipeline_apply(stage_fn, sp, xx, n_micro)
            return jnp.mean(y * y)

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P("pipe"), P()), out_specs=P()
        )(stacked, x)

    v_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(stacked, x)
    v_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(stacked, x)
    np.testing.assert_allclose(float(v_pp), float(v_ref), rtol=1e-6)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)


def test_pipeline_rejects_bad_microbatching():
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    stacked = _toy_stack(2, 4)
    x = jnp.zeros((3, 2, 4))
    stage_fn = stage_from_layer_fn(_toy_layer_fn)
    with pytest.raises(AssertionError, match="not divisible"):
        jax.shard_map(
            lambda sp, xx: pipeline_apply(stage_fn, sp, xx, 2),
            mesh=mesh,
            in_specs=(P("pipe"), P()),
            out_specs=P(),
        )(stacked, x)
