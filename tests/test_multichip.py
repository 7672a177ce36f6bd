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


def test_tp_through_run_training(tmp_path):
    """Tensor parallelism wired into the real trainer: run_training with
    --parallel.tensor_parallel 2 on the 8-device CPU mesh (dp=4 x tp=2),
    sharded params + optimizer state, training/validation/eval all pass."""
    from mamba_asr_tpu.cli import run_training
    from tests.test_configs_and_cli import _make_corpus

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    out = str(tmp_path / "results")
    argv = [
        os.path.join(REPO, "hparams", "CTC", "conmamba_small.yaml"),
        "--data.data_folder", corpus,
        "--data.output_folder", out,
        "--data.train_splits", "[train-clean-100]",
        "--data.test_splits", "[test-clean]",
        "--data.speed_perturb", "false",
        "--model.d_model", "16",
        "--model.num_encoder_layers", "1",
        "--model.d_ffn", "16",
        "--model.compute_dtype", "float32",
        "--model.mamba.d_state", "4",
        "--frontend.n_mels", "20",
        "--model.n_mels", "20",
        "--train.number_of_epochs", "1",
        "--train.grad_accumulation_factor", "1",
        "--data.num_buckets", "2",
        "--data.max_batch_seconds", "4.0",
        "--parallel.tensor_parallel", "2",
        "--parallel.min_shard_elements", "64",
    ]
    trainer = run_training(argv)
    assert trainer.mesh.shape == {"data": 4, "model": 2}
    assert int(trainer.state.step) > 0
    # At least one param leaf must actually be sharded over "model".
    from jax.sharding import PartitionSpec as P

    specs = [
        x.sharding.spec for x in jax.tree_util.tree_leaves(trainer.state.params)
    ]
    assert any("model" in str(s) for s in specs), specs
    # Optimizer state shards consistently with params (same rule).
    opt_specs = [
        x.sharding.spec
        for x in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(x, "sharding")
    ]
    assert any("model" in str(s) for s in opt_specs), opt_specs
    assert os.path.isfile(
        os.path.join(trainer.cfg.output_folder, "wer_test-clean.txt")
    )


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
