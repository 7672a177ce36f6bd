"""Config loading for every shipped yaml + full CLI pipeline on a
synthetic mini-LibriSpeech corpus."""

import glob
import os

import numpy as np
import pytest

from mamba_asr_tpu.configs.loader import load_config, parse_overrides
from mamba_asr_tpu.data.audio import read_wav, write_wav
from mamba_asr_tpu.data.librispeech import load_manifest, prepare_librispeech

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "hparams", "*", "*.yaml")))
)
def test_all_yamls_load(path):
    cfg = load_config(path)
    assert cfg.model.d_model > 0
    assert cfg.model.encoder_module in (
        "conmamba", "conformer", "transformer", "branchformer",
    )
    if "small" in path:
        assert cfg.model.d_model == 144
    if "S2S" in path:
        assert cfg.model.num_decoder_layers > 0
        assert cfg.train.ctc_weight == 0.3
    else:
        assert cfg.model.num_decoder_layers == 0
        assert cfg.model.vocab_size == 31
    if "conmambamamba" in path:
        assert cfg.model.decoder_module == "mamba"


def test_overrides():
    ov = parse_overrides(["--train.lr", "0.01", "--model.d_model=64",
                          "--data.speed_perturb", "false"])
    cfg = load_config(
        os.path.join(REPO, "hparams", "CTC", "conmamba_small.yaml"), ov
    )
    assert cfg.train.lr == 0.01
    assert cfg.model.d_model == 64
    assert cfg.data.speed_perturb is False


def _make_corpus(root, splits=("train-clean-100", "dev-clean", "test-clean")):
    rng = np.random.default_rng(0)
    words = ["HELLO", "WORLD", "GOOD", "DAY", "CAT", "DOG"]
    for split in splits:
        d = os.path.join(root, split, "1", "2")
        os.makedirs(d, exist_ok=True)
        lines = []
        for i in range(6):
            utt = f"1-2-{i:04d}"
            wav = rng.normal(0, 0.1, size=rng.integers(4000, 8000)).astype(
                np.float32
            )
            write_wav(os.path.join(d, utt + ".wav"), wav, 16000)
            text = " ".join(rng.choice(words, size=3))
            lines.append(f"{utt} {text}")
        with open(os.path.join(d, "1-2.trans.txt"), "w") as f:
            f.write("\n".join(lines))


def test_wav_roundtrip(tmp_path):
    wav = np.sin(np.linspace(0, 30, 2000)).astype(np.float32) * 0.7
    p = str(tmp_path / "x.wav")
    write_wav(p, wav, 16000)
    back, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1e-4)


def test_prepare_and_manifest(tmp_path):
    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus, splits=("dev-clean",))
    save = str(tmp_path / "manifests")
    prepare_librispeech(corpus, save, dev_splits=("dev-clean",))
    utts = load_manifest(os.path.join(save, "dev-clean.csv"))
    assert len(utts) == 6
    assert all(u.duration > 0.1 for u in utts)
    assert utts[0].spk_id == "1-2"
    # Skip logic: second call must not fail and keep files.
    prepare_librispeech(corpus, save, dev_splits=("dev-clean",))


def test_pronunciation_lexicon_split(tmp_path):
    """create_pronunciation_lexicon: reference CSV shape + 98/1/1 split
    semantics (librispeech_prepare.py:268-457) from a local dictionary
    file — stress digits stripped, duration = grapheme count, header in
    every split, test split takes the remainder, rows partition."""
    from mamba_asr_tpu.data.librispeech import create_pronunciation_lexicon

    d = str(tmp_path)
    words = [f"WORD{i:03d}" for i in range(200)]
    lex = os.path.join(d, "librispeech-lexicon.txt")
    with open(lex, "w") as f:
        for w in words:
            f.write(f"{w} HH AH0 L OW1\n")
    create_pronunciation_lexicon(d, lex)

    with open(os.path.join(d, "lexicon.csv")) as f:
        lines = f.readlines()
    assert lines[0] == "ID,duration,char,phn\n"
    assert len(lines) == 201
    idx, dur, chars, phn = lines[1].rstrip("\n").split(",")
    assert idx == "0" and dur == "7"
    assert chars == " ".join("WORD000")
    assert phn == "HH AH L OW"  # stress digits stripped

    sizes = {}
    bodies = []
    for name in ("lexicon_tr.csv", "lexicon_dev.csv", "lexicon_test.csv"):
        with open(os.path.join(d, name)) as f:
            rows = f.readlines()
        assert rows[0] == "ID,duration,char,phn\n"
        sizes[name] = len(rows) - 1
        bodies.extend(rows[1:])
    assert sizes["lexicon_tr.csv"] == 196  # floor(0.98 * 200)
    assert sizes["lexicon_dev.csv"] == 2
    assert sizes["lexicon_test.csv"] == 2  # remainder
    assert sorted(bodies) == sorted(lines[1:])  # exact partition


def test_cli_end_to_end(tmp_path):
    """One epoch of train_ctc on a synthetic corpus, full pipeline."""
    from mamba_asr_tpu.cli import run_training

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
        "--train.number_of_epochs", "2",
        "--train.grad_accumulation_factor", "1",
        "--data.num_buckets", "2",
        "--data.max_batch_seconds", "4.0",
    ]
    trainer = run_training(argv)
    exp_dir = trainer.cfg.output_folder
    assert os.path.isfile(os.path.join(exp_dir, "train_log.txt"))
    assert os.path.isfile(os.path.join(exp_dir, "wer_test-clean.txt"))
    assert glob.glob(os.path.join(exp_dir, "save", "*", "state.msgpack"))
    assert int(trainer.state.step) > 0


def test_evaluate_entry(tmp_path):
    """evaluate.py: eval-only harness on the checkpoints a training run
    left behind."""
    import subprocess
    import sys

    from mamba_asr_tpu.cli import run_training

    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    out = str(tmp_path / "results")
    common = [
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
        "--train.grad_accumulation_factor", "1",
        "--data.num_buckets", "2",
        "--data.max_batch_seconds", "4.0",
    ]
    run_training(common + ["--train.number_of_epochs", "1"])

    import evaluate as eval_mod

    eval_mod.main(common)
    exp = os.path.join(out, "CTC/conmamba_small", "3407")
    assert os.path.isfile(os.path.join(exp, "wer_test-clean.txt"))


def test_recognize_entry(tmp_path, capsys):
    """recognize.py: greedy, beam, and streaming (with end-of-stream
    flush) transcription from a trained checkpoint."""
    import sys as _sys

    from mamba_asr_tpu.cli import run_training

    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    out = str(tmp_path / "results")
    common = [
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
        "--train.grad_accumulation_factor", "1",
        "--data.num_buckets", "2",
        "--data.max_batch_seconds", "4.0",
    ]
    run_training(common + ["--train.number_of_epochs", "1"])

    import recognize as rec_mod

    exp = os.path.join(out, "CTC/conmamba_small", "3407")
    wav = glob.glob(os.path.join(corpus, "test-clean", "1", "2",
                                 "*.wav"))[0]
    base = [common[0], wav,
            "--ckpt_dir", os.path.join(exp, "save"),
            "--tokenizer", os.path.join(exp, "tokenizer_char.json"),
            ] + common[1:]
    for extra in ([], ["--beam", "4"], ["--streaming"], ["--timestamps"]):
        old_argv = _sys.argv
        _sys.argv = ["recognize.py"] + base + extra
        try:
            rec_mod.main()
        finally:
            _sys.argv = old_argv
        printed = capsys.readouterr().out
        assert wav in printed, (extra, printed)

    # Batched transcription agrees with per-file transcription.
    wavs = sorted(glob.glob(os.path.join(corpus, "test-clean", "1", "2",
                                         "*.wav")))[:3]
    single = {}
    for w in wavs:
        _sys.argv = ["recognize.py", common[0], w] + base[2:]
        try:
            rec_mod.main()
        finally:
            _sys.argv = old_argv
        line = capsys.readouterr().out.strip().splitlines()[-1]
        single[w] = line.split("\t", 1)[1] if "\t" in line else ""
    _sys.argv = (["recognize.py", common[0]] + wavs + base[2:]
                 + ["--batch", "2"])
    try:
        rec_mod.main()
    finally:
        _sys.argv = old_argv
    batched = {}
    for line in capsys.readouterr().out.strip().splitlines():
        p, _, txt = line.partition("\t")
        batched[p] = txt
    assert batched == single, (batched, single)


def test_recognize_s2s_entry(tmp_path, capsys):
    """recognize.py --s2s: file -> transcript through the joint
    CTC/attention beam (the reference's test_searcher applied to an
    arbitrary batch, /root/reference/train_S2S.py:387-394)."""
    import sys as _sys

    from mamba_asr_tpu.cli import run_training

    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    out = str(tmp_path / "results")
    common = [
        os.path.join(REPO, "hparams", "S2S", "conmambamamba_small.yaml"),
        "--data.data_folder", corpus,
        "--data.output_folder", out,
        "--data.train_splits", "[train-clean-100]",
        "--data.test_splits", "[test-clean]",
        "--data.speed_perturb", "false",
        "--model.d_model", "16",
        "--model.num_encoder_layers", "1",
        "--model.num_decoder_layers", "1",
        "--model.nhead", "2",
        "--model.d_ffn", "16",
        "--model.compute_dtype", "float32",
        "--model.mamba.d_state", "4",
        "--frontend.n_mels", "20",
        "--model.n_mels", "20",
        "--train.grad_accumulation_factor", "1",
        "--data.num_buckets", "2",
        "--data.max_batch_seconds", "4.0",
        "--decode.valid_search_interval", "5",
    ]
    run_training(common + ["--train.number_of_epochs", "1"])

    import recognize as rec_mod

    exp = os.path.join(out, "S2S/conmambamamba_small", "3407")
    wav = glob.glob(os.path.join(corpus, "test-clean", "1", "2",
                                 "*.wav"))[0]
    old_argv = _sys.argv
    _sys.argv = (["recognize.py", common[0], wav,
                  "--ckpt_dir", os.path.join(exp, "save"),
                  "--tokenizer", os.path.join(exp, "tokenizer_bpe.json"),
                  "--s2s", "--beam", "3"] + common[1:])
    try:
        rec_mod.main()
    finally:
        _sys.argv = old_argv
    printed = capsys.readouterr().out
    assert wav in printed, printed


def test_export_torch_entry(tmp_path):
    """scripts/export_torch.py: trained experiment -> reference-format
    model.ckpt + normalizer.ckpt, byte-faithful when re-imported through
    the --torch_ckpt path (the two interchange directions agree)."""
    import jax
    import numpy as np

    from mamba_asr_tpu.cli import restore_asr_state, run_training

    corpus = str(tmp_path / "LibriSpeech")
    _make_corpus(corpus)
    out = str(tmp_path / "results")
    common = [
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
        "--train.grad_accumulation_factor", "1",
        "--data.num_buckets", "2",
        "--data.max_batch_seconds", "4.0",
        "--train.number_of_epochs", "1",
    ]
    run_training(common)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "export_torch", os.path.join(REPO, "scripts", "export_torch.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    exp = os.path.join(out, "CTC/conmamba_small", "3407")
    export_dir = str(tmp_path / "export")
    mod.main([common[0], "--ckpt_dir", os.path.join(exp, "save"),
              "--out_dir", export_dir] + common[1:])
    assert os.path.exists(os.path.join(export_dir, "model.ckpt"))

    from mamba_asr_tpu.configs.loader import load_config, parse_overrides

    cfg = load_config(common[0], parse_overrides(common[1:]))
    _, st_avg = restore_asr_state(cfg, ckpt_dir=os.path.join(exp, "save"))
    _, st_imp = restore_asr_state(
        cfg,
        torch_ckpt=os.path.join(export_dir, "model.ckpt"),
        torch_normalizer=os.path.join(export_dir, "normalizer.ckpt"),
    )
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(st_avg.params),
        jax.tree_util.tree_leaves_with_path(st_imp.params),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=jax.tree_util.keystr(pa)
        )
    np.testing.assert_allclose(
        np.asarray(st_avg.normalizer.mean), np.asarray(st_imp.normalizer.mean),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(st_avg.normalizer.m2), np.asarray(st_imp.normalizer.m2),
        rtol=1e-4,
    )
