"""Selective scan: XLA parallel scan vs sequential reference, grads, step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_asr_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_ref,
    selective_scan_xla,
    ssm_step,
)


def _make_inputs(key, bsz=2, length=37, d=8, n=4, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (bsz, length, d), dtype)
    delta = jax.random.normal(ks[1], (bsz, length, d), dtype) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)))
    B = jax.random.normal(ks[3], (bsz, length, n), dtype)
    C = jax.random.normal(ks[4], (bsz, length, n), dtype)
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (bsz, length, d), dtype)
    delta_bias = jnp.linspace(-1.0, 1.0, d)
    return u, delta, A, B, C, D, z, delta_bias


@pytest.mark.parametrize("with_extras", [False, True])
def test_xla_matches_ref(with_extras):
    u, delta, A, B, C, D, z, db = _make_inputs(jax.random.PRNGKey(0))
    kwargs = dict(delta_softplus=True)
    if with_extras:
        kwargs.update(D=D, z=z, delta_bias=db)
    out_ref = selective_scan_ref(u, delta, A, B, C, **kwargs)
    out_xla = selective_scan_xla(u, delta, A, B, C, **kwargs)
    np.testing.assert_allclose(out_ref, out_xla, rtol=2e-5, atol=2e-5)


def test_last_state_matches():
    u, delta, A, B, C, D, z, db = _make_inputs(jax.random.PRNGKey(1))
    out_ref, h_ref = selective_scan_ref(
        u, delta, A, B, C, D, z, db, True, return_last_state=True
    )
    out_xla, h_xla = selective_scan_xla(
        u, delta, A, B, C, D, z, db, True, return_last_state=True
    )
    np.testing.assert_allclose(h_ref, h_xla, rtol=2e-5, atol=2e-5)


def test_initial_state_chaining():
    """Scanning [first half] then [second half with h0] == full scan."""
    u, delta, A, B, C, D, z, db = _make_inputs(jax.random.PRNGKey(2), length=24)
    half = 12
    full = selective_scan_xla(u, delta, A, B, C, D, z, db, True)
    out1, h = selective_scan_xla(
        u[:, :half], delta[:, :half], A, B[:, :half], C[:, :half],
        D, z[:, :half], db, True, return_last_state=True,
    )
    out2 = selective_scan_xla(
        u[:, half:], delta[:, half:], A, B[:, half:], C[:, half:],
        D, z[:, half:], db, True, h0=h,
    )
    np.testing.assert_allclose(
        full, jnp.concatenate([out1, out2], axis=1), rtol=2e-5, atol=2e-5
    )


def test_gradients_match_ref():
    u, delta, A, B, C, D, z, db = _make_inputs(jax.random.PRNGKey(3), length=19)

    def loss(fn, args):
        return jnp.sum(fn(*args, D=D, z=z, delta_bias=db, delta_softplus=True) ** 2)

    g_ref = jax.grad(lambda *a: loss(selective_scan_ref, a), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C
    )
    g_xla = jax.grad(lambda *a: loss(selective_scan_xla, a), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C
    )
    for gr, gx in zip(g_ref, g_xla):
        np.testing.assert_allclose(gr, gx, rtol=5e-4, atol=5e-5)


def test_ssm_step_matches_scan():
    """Stepping token-by-token reproduces the full scan (decode cache)."""
    u, delta, A, B, C, D, z, db = _make_inputs(jax.random.PRNGKey(4), length=9)
    full = selective_scan_ref(u, delta, A, B, C, D, z, db, True)
    h = jnp.zeros((u.shape[0], u.shape[2], A.shape[1]), jnp.float32)
    outs = []
    for t in range(u.shape[1]):
        y, h = ssm_step(
            h, u[:, t], delta[:, t], A, B[:, t], C[:, t], D, z[:, t], db, True
        )
        outs.append(y)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(full, stepped, rtol=2e-5, atol=2e-5)


def test_dispatch_auto_runs():
    u, delta, A, B, C, D, z, db = _make_inputs(jax.random.PRNGKey(5))
    out = selective_scan(u, delta, A, B, C, D, z, db, True)
    assert out.shape == u.shape


def test_bf16_inputs():
    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(6), dtype=jnp.bfloat16
    )
    out = selective_scan_xla(u, delta, A, B, C, D, z, db, True)
    assert out.dtype == jnp.bfloat16
    ref = selective_scan_ref(u, delta, A, B, C, D, z, db, True)
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), rtol=2e-2, atol=2e-2
    )


def test_chunked_matches_ref():
    from mamba_asr_tpu.ops.selective_scan import selective_scan_chunked

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(7), length=70, d=6, n=3
    )
    ref = selective_scan_ref(u, delta, A, B, C, D, z, db, True)
    out, h = selective_scan_chunked(
        u, delta, A, B, C, D, z, db, True,
        return_last_state=True, chunk_size=16,
    )
    np.testing.assert_allclose(ref, out, rtol=2e-5, atol=2e-5)
    _, h_ref = selective_scan_ref(
        u, delta, A, B, C, D, z, db, True, return_last_state=True
    )
    np.testing.assert_allclose(h_ref, h, rtol=2e-5, atol=2e-5)


def test_chunked_gradients_match():
    from mamba_asr_tpu.ops.selective_scan import selective_scan_chunked

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(8), length=40, d=4, n=3
    )

    def loss(fn, u, delta, A, B, C):
        return jnp.sum(
            fn(u, delta, A, B, C, D=D, z=z, delta_bias=db,
               delta_softplus=True) ** 2
        )

    g_ref = jax.grad(
        lambda *a: loss(selective_scan_ref, *a), argnums=(0, 1, 2, 3, 4)
    )(u, delta, A, B, C)
    g_chk = jax.grad(
        lambda *a: loss(
            lambda *args, **kw: selective_scan_chunked(
                *args, **kw, chunk_size=16
            ), *a
        ),
        argnums=(0, 1, 2, 3, 4),
    )(u, delta, A, B, C)
    for gr, gc in zip(g_ref, g_chk):
        np.testing.assert_allclose(gr, gc, rtol=5e-4, atol=5e-5)


def test_pallas_kernel_interpret_matches_ref():
    """Pallas kernel logic validated on CPU via interpreter mode."""
    from mamba_asr_tpu.ops.pallas.scan import _pallas_fwd_impl

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(9), bsz=2, length=150, d=12, n=4
    )
    ref, h_ref = selective_scan_ref(
        u, delta, A, B, C, D, z, db, True, return_last_state=True
    )
    out, h_last = _pallas_fwd_impl(u, delta, A, B, C, D, z, db, True,
                                   interpret=True)
    np.testing.assert_allclose(ref, out, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(h_ref, h_last, rtol=2e-4, atol=2e-4)


def test_pallas_kernel_interpret_h0_carried_state():
    """Chunked streaming through the kernel: h0 in / last state out must
    chain exactly — two half-length kernel calls == one full call."""
    from mamba_asr_tpu.ops.pallas.scan import _pallas_fwd_impl

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(21), bsz=2, length=160, d=12, n=4
    )
    full, h_full = _pallas_fwd_impl(u, delta, A, B, C, D, z, db, True,
                                    interpret=True)
    half = 70  # deliberately not a multiple of L_CHUNK
    o1, h1 = _pallas_fwd_impl(
        u[:, :half], delta[:, :half], A, B[:, :half], C[:, :half], D,
        z[:, :half], db, True, interpret=True,
    )
    o2, h2 = _pallas_fwd_impl(
        u[:, half:], delta[:, half:], A, B[:, half:], C[:, half:], D,
        z[:, half:], db, True, h0=h1, interpret=True,
    )
    np.testing.assert_allclose(
        np.concatenate([o1, o2], axis=1), full, rtol=3e-4, atol=3e-4
    )
    np.testing.assert_allclose(h2, h_full, rtol=3e-4, atol=3e-4)


def test_analytic_vjp_matches_autodiff():
    """selective_scan_vjp (chunk-checkpointed analytic adjoint) vs
    jax.grad of the sequential reference."""
    from mamba_asr_tpu.ops.selective_scan import selective_scan_vjp

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(11), bsz=2, length=45, d=6, n=3
    )
    cot = jax.random.normal(jax.random.PRNGKey(12), u.shape)

    def loss(u, delta, A, B, C, D, z, db):
        out = selective_scan_ref(
            u, delta, A, B, C, D=D, z=z, delta_bias=db, delta_softplus=True
        )
        return jnp.sum(out * cot)

    ref_grads = jax.grad(loss, argnums=tuple(range(8)))(
        u, delta, A, B, C, D, z, db
    )
    ana_grads = selective_scan_vjp(
        (u, delta, A, B, C, D, z, db), cot,
        delta_softplus=True, chunk_size=16,
    )
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias"]
    for name, r, a in zip(names, ref_grads, ana_grads):
        np.testing.assert_allclose(
            r, a, rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_pallas_bwd_kernel_interpret_matches_oracle():
    """Pallas adjoint kernel (interpret mode) vs jax.grad of the ref."""
    from mamba_asr_tpu.ops.pallas.scan import selective_scan_bwd_pallas

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(13), bsz=2, length=150, d=10, n=4
    )
    cot = jax.random.normal(jax.random.PRNGKey(14), u.shape)

    def loss(u, delta, A, B, C, D, z, db):
        out = selective_scan_ref(
            u, delta, A, B, C, D=D, z=z, delta_bias=db, delta_softplus=True
        )
        return jnp.sum(out * cot)

    ref_grads = jax.grad(loss, argnums=tuple(range(8)))(
        u, delta, A, B, C, D, z, db
    )
    ana_grads = selective_scan_bwd_pallas(
        (u, delta, A, B, C, D, z, db), cot, delta_softplus=True,
        interpret=True,
    )
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias"]
    for name, r, a in zip(names, ref_grads, ana_grads):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(a), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_pallas_bwd_kernel_interpret_no_softplus_padded_ddb():
    """delta_softplus=False at a non-chunk-multiple length: padded time
    rows carry a nonzero gh term into ddt, and the in-kernel ddb
    accumulation must exclude them via the valid-length mask (with
    softplus the rows self-mask through dsp ~= 0)."""
    from mamba_asr_tpu.ops.pallas.scan import selective_scan_bwd_pallas

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(31), bsz=2, length=70, d=10, n=4
    )
    # Keep dt = delta + delta_bias strictly positive without softplus
    # (negative dt with A < 0 gives da > 1, which compounds to inf over
    # the sequence and nan-poisons the reference grads).
    delta = jnp.abs(delta) * 0.1 + 1.05
    cot = jax.random.normal(jax.random.PRNGKey(32), u.shape)

    def loss(u, delta, A, B, C, D, z, db):
        out = selective_scan_ref(
            u, delta, A, B, C, D=D, z=z, delta_bias=db,
            delta_softplus=False,
        )
        return jnp.sum(out * cot)

    ref_grads = jax.grad(loss, argnums=tuple(range(8)))(
        u, delta, A, B, C, D, z, db
    )
    ana_grads = selective_scan_bwd_pallas(
        (u, delta, A, B, C, D, z, db), cot, delta_softplus=False,
        interpret=True,
    )
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias"]
    for name, r, a in zip(names, ref_grads, ana_grads):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(a), rtol=3e-4, atol=3e-5,
            err_msg=name,
        )


def test_pallas_bwd_kernel_interpret_multi_d_tile():
    """d > D_TILE: dB/dC are reductions over ALL d-tiles — regression
    test for the d-tile overwrite bug (partials must accumulate, not
    overwrite, across the d grid axis)."""
    from mamba_asr_tpu.ops.pallas.scan import selective_scan_bwd_pallas

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(27), bsz=1, length=140, d=260, n=4
    )
    cot = jax.random.normal(jax.random.PRNGKey(28), u.shape)

    def loss(B, C):
        out = selective_scan_ref(
            u, delta, A, B, C, D=D, z=z, delta_bias=db, delta_softplus=True
        )
        return jnp.sum(out * cot)

    ref_gB, ref_gC = jax.grad(loss, argnums=(0, 1))(B, C)
    ana = selective_scan_bwd_pallas(
        (u, delta, A, B, C, D, z, db), cot, delta_softplus=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref_gB), np.asarray(ana[3]),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ref_gC), np.asarray(ana[4]),
                               rtol=3e-4, atol=3e-5)


def test_pallas_bwd_kernel_interpret_h0_and_last_state_grads():
    """Full adjoint incl. dh0 and d(h_last) — a superset of the reference
    kernel, which drops the last-state gradient
    (selective_scan_interface.py:84-86)."""
    from mamba_asr_tpu.ops.pallas.scan import selective_scan_bwd_pallas

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(23), bsz=2, length=150, d=10, n=4
    )
    h0 = jax.random.normal(
        jax.random.PRNGKey(24), (u.shape[0], u.shape[2], A.shape[1])
    )
    cot = jax.random.normal(jax.random.PRNGKey(25), u.shape)
    cot_h = jax.random.normal(jax.random.PRNGKey(26), h0.shape)

    def loss(u, delta, A, B, C, D, z, db, h0):
        out, h_last = selective_scan_ref(
            u, delta, A, B, C, D=D, z=z, delta_bias=db, delta_softplus=True,
            h0=h0, return_last_state=True,
        )
        return jnp.sum(out * cot) + jnp.sum(h_last * cot_h)

    ref_grads = jax.grad(loss, argnums=tuple(range(9)))(
        u, delta, A, B, C, D, z, db, h0
    )
    ana_grads = selective_scan_bwd_pallas(
        (u, delta, A, B, C, D, z, db, h0), (cot, cot_h),
        delta_softplus=True, interpret=True,
    )
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias", "h0"]
    for name, r, a in zip(names, ref_grads, ana_grads):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(a), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_pallas_bwd_kernel_interpret_fwd_emitted_boundaries():
    """Boundary-seeded adjoint: the forward kernel's per-chunk boundary
    states (want_bounds=True) replace the XLA boundary-recompute pass in
    the backward — grads must match jax.grad of the reference exactly as
    the recompute path does. This is the custom_vjp path taken on TPU."""
    from mamba_asr_tpu.ops.pallas.scan import (
        _pallas_fwd_impl,
        selective_scan_bwd_pallas,
    )

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(31), bsz=2, length=150, d=10, n=4
    )
    h0 = jax.random.normal(
        jax.random.PRNGKey(32), (u.shape[0], u.shape[2], A.shape[1])
    )
    cot = jax.random.normal(jax.random.PRNGKey(33), u.shape)
    cot_h = jax.random.normal(jax.random.PRNGKey(34), h0.shape)

    def loss(u, delta, A, B, C, D, z, db, h0):
        out, h_last = selective_scan_ref(
            u, delta, A, B, C, D=D, z=z, delta_bias=db, delta_softplus=True,
            h0=h0, return_last_state=True,
        )
        return jnp.sum(out * cot) + jnp.sum(h_last * cot_h)

    ref_grads = jax.grad(loss, argnums=tuple(range(9)))(
        u, delta, A, B, C, D, z, db, h0
    )
    _, h_last, bounds, dt_post, y_pre = _pallas_fwd_impl(
        u, delta, A, B, C, D, z, db, True, h0=h0, interpret=True,
        want_bounds=True,
    )
    # Emitted dt must equal softplus(delta + bias) on valid rows, 0 on pad.
    np.testing.assert_allclose(
        np.asarray(dt_post[:, : u.shape[1], : u.shape[2]]),
        np.asarray(jax.nn.softplus(delta + db)), rtol=1e-6, atol=1e-6,
    )
    assert float(jnp.abs(dt_post[:, u.shape[1]:]).max()) == 0.0
    # h_bounds[:, -1] must equal h_last (kernel layout, padded D).
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(bounds[:, -1, :, :u.shape[2]], 1, 2)),
        np.asarray(h_last), rtol=1e-5, atol=1e-6,
    )
    # Emitted pre-gate y must equal the ungated reference output.
    y_ref = selective_scan_ref(
        u, delta, A, B, C, D=D, z=None, delta_bias=db, delta_softplus=True,
        h0=h0,
    )
    np.testing.assert_allclose(
        np.asarray(y_pre[:, : u.shape[1], : u.shape[2]]),
        np.asarray(y_ref), rtol=2e-5, atol=2e-5,
    )
    ana_grads = selective_scan_bwd_pallas(
        (u, delta, A, B, C, D, z, db, h0), (cot, cot_h),
        delta_softplus=True, interpret=True, boundaries=bounds,
        dt_post=dt_post, y_pre=y_pre,
    )
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias", "h0"]
    for name, r, a in zip(names, ref_grads, ana_grads):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(a), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_pallas_bwd_merged_scans_bitwise_equal_separate():
    """The interleaved fwd+rev chunk-scan pass (_merged_chunk_scans) is a
    pure statement reorder of independent expression trees — grads must be
    BITWISE identical to the separate-scans kernel."""
    from mamba_asr_tpu.ops.pallas.scan import selective_scan_bwd_pallas

    u, delta, A, B, C, D, z, db = _make_inputs(
        jax.random.PRNGKey(23), bsz=2, length=200, d=12, n=4
    )
    cot = jax.random.normal(jax.random.PRNGKey(24), u.shape)
    g_merged = selective_scan_bwd_pallas(
        (u, delta, A, B, C, D, z, db), cot, delta_softplus=True,
        interpret=True, merged=True,
    )
    g_sep = selective_scan_bwd_pallas(
        (u, delta, A, B, C, D, z, db), cot, delta_softplus=True,
        interpret=True, merged=False,
    )
    for a, b in zip(g_merged, g_sep):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
