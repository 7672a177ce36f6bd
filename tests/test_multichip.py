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
    assert trainer.mesh.shape["data"] == 4
    assert trainer.mesh.shape["model"] == 2
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


def test_activation_mesh_scoped_per_trainer(tmp_path):
    """Round-3 regression: the activation mesh must be scoped to each
    trainer's step calls, never left in module-global state. Build an
    8-device-mesh trainer, run a step, then (a) verify no global mesh
    remains, (b) trace a 4-device shard_map that calls constrain_batch
    (the exact round-3 full-suite failure: the leaked 8-device mesh made
    this die with 'incompatible devices'), and (c) build + step a second
    trainer on a 4-device mesh."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from mamba_asr_tpu.configs.loader import load_config
    from mamba_asr_tpu.parallel import mesh as meshmod
    from mamba_asr_tpu.parallel.mesh import make_mesh, shard_batch
    from mamba_asr_tpu.training.loop import Trainer
    from tests.test_e2e_train import _synthetic_batch

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tiny = {
        "model": {
            "d_model": 16, "num_encoder_layers": 1, "d_ffn": 16,
            "compute_dtype": "float32", "n_mels": 20,
            "mamba": {"d_state": 4},
        },
        "frontend": {"n_mels": 20},
        "train": {"grad_accumulation_factor": 1},
    }
    yaml = os.path.join(REPO, "hparams", "CTC", "conmamba_small.yaml")

    def step_once(trainer, batch):
        trainer.init_state(batch)
        sharded = shard_batch(batch, trainer.mesh)
        trainer.state, metrics = trainer.train_step(
            trainer.state, sharded, jax.random.PRNGKey(0), jnp.asarray(False)
        )
        assert np.isfinite(float(metrics["loss"]))

    cfg8 = load_config(
        yaml, {**tiny, "data": {"output_folder": str(tmp_path / "m8")}}
    )
    t8 = Trainer(cfg8, tokenizer=None, mesh=make_mesh(data=8, model=1))
    step_once(t8, _synthetic_batch(np.random.default_rng(0), bsz=8))
    assert meshmod._ACTIVE_MESH is None

    mesh4 = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    f4 = jax.jit(
        shard_map(
            lambda x: meshmod.constrain_batch(x) + 1.0,
            mesh=mesh4, in_specs=P("pipe"), out_specs=P("pipe"),
        )
    )
    np.testing.assert_allclose(np.asarray(f4(jnp.zeros((8, 3)))), 1.0)

    cfg4 = load_config(
        yaml, {**tiny, "data": {"output_folder": str(tmp_path / "m4")}}
    )
    t4 = Trainer(
        cfg4, tokenizer=None,
        mesh=make_mesh(data=4, model=1, devices=jax.devices()[:4]),
    )
    step_once(t4, _synthetic_batch(np.random.default_rng(1), bsz=4))
    assert meshmod._ACTIVE_MESH is None


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
