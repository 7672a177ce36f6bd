"""Multi-device sharding: full train step under data-parallel and hybrid
data x tensor parallel meshes on the virtual 8-device CPU backend."""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_dp_and_tp():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    # Runs dp=8 and dp=4 x tp=2 and asserts the losses agree.
    g.dryrun_multichip(8)


def test_infer_param_shardings_rules():
    import jax.numpy as jnp

    from mamba_asr_tpu.parallel.mesh import infer_param_shardings, make_mesh

    mesh = make_mesh(data=4, model=2)
    params = {
        "big_kernel": jnp.zeros((512, 128)),   # sharded (last dim % 2 == 0)
        "small": jnp.zeros((4, 4)),            # too small -> replicated
        "bias": jnp.zeros((1024,)),            # 1-D -> replicated
        "odd": jnp.zeros((512, 129)),          # indivisible -> replicated
    }
    sh = infer_param_shardings(params, mesh, min_elements=1 << 10)
    assert sh["big_kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["bias"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
