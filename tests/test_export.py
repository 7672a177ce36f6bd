"""StableHLO export bundles: serialize -> reload -> exact parity.

The deployment contract is that an ExportedASR bundle, loaded with no
model code, reproduces make_eval_step's CTC surface exactly (same
program, same platform). The reference has no deployment/export path
(docs-only CoreML exploration); these tests pin ours."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.serving.export import (
    ExportedASR,
    export_ctc_bundle,
)
from mamba_asr_tpu.training.normalizer import init_normalizer
from mamba_asr_tpu.training.trainer import FrontendConfig, make_eval_step

FRONTEND = FrontendConfig(n_fft=256, n_mels=20, win_length_ms=16.0)
SR = FRONTEND.sample_rate


def _model_and_params():
    cfg = ASRConfig(
        vocab_size=9, n_mels=20, d_model=8, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=16,
        dropout=0.0, encoder_module="conmamba", kernel_size=7,
        causal=True, bidirectional=False,
        mamba=MambaConfig(d_state=4, d_conv=4, expand=2, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), feats, jnp.array([16]))
    return model, variables["params"]


def _rand_wav(rng, n):
    return rng.normal(0, 0.3, size=n).astype(np.float32)


def test_export_roundtrip_exact(tmp_path):
    """Export two buckets, reload from disk, and match make_eval_step
    bitwise on an input that exercises bucket padding (shorter wav and
    fewer rows than the chosen bucket)."""
    model, params = _model_and_params()
    normalizer = init_normalizer(FRONTEND.n_mels)
    out = str(tmp_path / "bundle")
    buckets = [(1, SR // 2), (2, SR)]
    manifest = export_ctc_bundle(
        model, params, normalizer, FRONTEND, out, buckets
    )
    assert sorted(tuple(b) for b in manifest["buckets"]) == sorted(buckets)
    assert os.path.exists(os.path.join(out, "params.msgpack"))

    asr = ExportedASR(out)
    rng = np.random.default_rng(0)

    # 1 row, 0.7 s: must pick the (2, SR) bucket and pad both axes.
    n = int(0.7 * SR)
    wav = _rand_wav(rng, n)[None]
    lens = np.array([n], np.int32)
    lp, el = asr(wav, lens)
    assert lp.shape[0] == 1 and el.shape == (1,)
    assert lp.shape[2] == model.cfg.vocab_size

    # Reference: the in-framework eval step on the SAME padded shapes.
    eval_step = make_eval_step(model, FRONTEND)
    wav_pad = np.zeros((2, SR), np.float32)
    wav_pad[0, :n] = wav[0]
    batch = {
        "wav": jnp.asarray(wav_pad),
        "wav_lens": jnp.asarray(np.array([n, 1], np.int32)),
        "tokens_bos": jnp.zeros((2, 4), jnp.int32),
    }
    ref = eval_step(params, normalizer, batch)
    np.testing.assert_allclose(
        lp, np.asarray(ref["ctc_log_probs"])[:1], rtol=0, atol=0
    )
    np.testing.assert_array_equal(el, np.asarray(ref["enc_lengths"])[:1])

    # Exact-fit input picks the small bucket (no padding path).
    wav2 = _rand_wav(rng, SR // 2)[None]
    lp2, el2 = asr(wav2, np.array([SR // 2], np.int32))
    batch2 = {
        "wav": jnp.asarray(wav2),
        "wav_lens": jnp.asarray(np.array([SR // 2], np.int32)),
        "tokens_bos": jnp.zeros((1, 4), jnp.int32),
    }
    ref2 = eval_step(params, normalizer, batch2)
    np.testing.assert_allclose(
        lp2, np.asarray(ref2["ctc_log_probs"]), rtol=0, atol=0
    )
    np.testing.assert_array_equal(el2, np.asarray(ref2["enc_lengths"]))


def test_export_bucket_selection_and_overflow(tmp_path):
    """Smallest fitting bucket wins; inputs that fit no bucket raise."""
    model, params = _model_and_params()
    normalizer = init_normalizer(FRONTEND.n_mels)
    out = str(tmp_path / "bundle")
    export_ctc_bundle(
        model, params, normalizer, FRONTEND, out,
        [(1, SR // 2), (4, SR // 2), (1, SR)],
    )
    asr = ExportedASR(out)
    assert asr._pick(1, SR // 4) == (1, SR // 2)
    assert asr._pick(2, SR // 4) == (4, SR // 2)
    assert asr._pick(1, 3 * SR // 4) == (1, SR)
    try:
        asr._pick(2, SR)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_export_weights_not_inlined(tmp_path):
    """Params must be exported as ARGUMENTS, not HLO constants (the
    serialized-HLO size trap, docs/DESIGN.md §9): the StableHLO size
    must not grow with parameter count. Compare two exports that
    differ only in d_model."""
    normalizer = init_normalizer(FRONTEND.n_mels)
    sizes = {}
    for d_model in (8, 32):
        cfg = ASRConfig(
            vocab_size=9, n_mels=20, d_model=d_model, nhead=2,
            num_encoder_layers=2, num_decoder_layers=0, d_ffn=4 * d_model,
            dropout=0.0, encoder_module="conmamba", kernel_size=7,
            causal=True, bidirectional=False,
            mamba=MambaConfig(d_state=4, d_conv=4, expand=2,
                              scan_impl="xla"),
        )
        model = ASRModel(cfg)
        feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(1), feats, jnp.array([16])
        )["params"]
        out = str(tmp_path / f"b{d_model}")
        export_ctc_bundle(
            model, params, normalizer, FRONTEND, out, [(1, SR // 2)]
        )
        fn = [f for f in os.listdir(out) if f.endswith(".stablehlo")][0]
        sizes[d_model] = os.path.getsize(os.path.join(out, fn))
        n_param_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(jax.tree.map(np.asarray, params))
        )
    # 16x the parameters must not balloon the program text: allow only
    # small growth (shape literals etc.), nothing near n_param_bytes.
    assert sizes[32] < 1.5 * sizes[8], sizes
    assert sizes[32] < n_param_bytes + sizes[8], sizes


def test_export_manifest_fields(tmp_path):
    model, params = _model_and_params()
    normalizer = init_normalizer(FRONTEND.n_mels)
    out = str(tmp_path / "bundle")
    export_ctc_bundle(
        model, params, normalizer, FRONTEND, out, [(1, SR // 2)]
    )
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["sample_rate"] == SR
    assert m["vocab_size"] == 9
    assert m["platforms"] == [jax.default_backend()]


def test_export_s2s_full_beam_search(tmp_path):
    """The S2S surface exports the ENTIRE joint CTC/attention beam
    search: bundle output == in-framework searcher on the same padded
    shapes (tokens exactly; scores to float tolerance, since the
    exported program fuses encoder+search into one executable)."""
    from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher
    from mamba_asr_tpu.serving.export import export_s2s_bundle
    from mamba_asr_tpu.training.normalizer import apply_normalizer
    from mamba_asr_tpu.training.trainer import (
        compute_features,
        frame_lengths,
    )

    cfg = ASRConfig(
        vocab_size=9, n_mels=20, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=1, d_ffn=16,
        dropout=0.0, encoder_module="conmamba", decoder_module="mamba",
        kernel_size=7, causal=True, bidirectional=False,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(1), feats, jnp.array([16]),
        jnp.array([[1, 3, 4]]),
    )["params"]
    normalizer = init_normalizer(FRONTEND.n_mels)
    searcher = S2SBeamSearcher(
        model, beam_size=3, ctc_weight=0.3, max_steps_cap=8
    )
    out = str(tmp_path / "bundle")
    manifest = export_s2s_bundle(
        model, params, normalizer, FRONTEND, searcher, out, [(2, SR // 2)]
    )
    assert manifest["surface"] == "s2s" and manifest["has_lm"] is False

    asr = ExportedASR(out)
    rng = np.random.default_rng(1)
    n = int(0.4 * SR)
    wav = _rand_wav(rng, n)[None]
    toks_e, lens_e, scores_e = asr(wav, np.array([n], np.int32))
    assert toks_e.shape[0] == 1 and lens_e.shape == (1,)

    # In-framework reference on the SAME padded bucket shapes.
    wav_pad = np.zeros((2, SR // 2), np.float32)
    wav_pad[0, :n] = wav[0]
    wav_lens = jnp.asarray(np.array([n, 1], np.int32))
    f = compute_features(FRONTEND, jnp.asarray(wav_pad))
    fl = jnp.minimum(frame_lengths(FRONTEND, wav_lens), f.shape[1])
    f = apply_normalizer(normalizer, f)
    mo = model.apply({"params": params}, f, fl, None, train=False)
    toks_r, lens_r, scores_r = searcher(
        {"params": params}, mo["enc_out"], mo["enc_lengths"],
        ctc_log_probs=mo["ctc_log_probs"],
    )
    np.testing.assert_array_equal(toks_e, np.asarray(toks_r)[:1])
    np.testing.assert_array_equal(lens_e, np.asarray(lens_r)[:1])
    np.testing.assert_allclose(
        scores_e, np.asarray(scores_r)[:1], rtol=1e-5, atol=1e-5
    )


def test_export_s2s_with_lm_fusion(tmp_path):
    """LM-fused bundles: LM weights ride as a second msgpack argument
    file and the loader feeds them; output == in-framework searcher."""
    from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher
    from mamba_asr_tpu.models.lm import TransformerLM
    from mamba_asr_tpu.serving.export import export_s2s_bundle
    from mamba_asr_tpu.training.normalizer import apply_normalizer
    from mamba_asr_tpu.training.trainer import (
        compute_features,
        frame_lengths,
    )

    cfg = ASRConfig(
        vocab_size=9, n_mels=20, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=1, d_ffn=16,
        dropout=0.0, encoder_module="conmamba", decoder_module="mamba",
        kernel_size=7, causal=True, bidirectional=False,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(1), feats, jnp.array([16]),
        jnp.array([[1, 3, 4]]),
    )["params"]
    lm = TransformerLM(vocab_size=9, d_model=16, nhead=2, num_layers=1,
                       d_ffn=16)
    lm_params = lm.init(jax.random.PRNGKey(2), jnp.ones((1, 4), jnp.int32))
    normalizer = init_normalizer(FRONTEND.n_mels)
    searcher = S2SBeamSearcher(
        model, beam_size=3, ctc_weight=0.4, lm_weight=0.6,
        temperature=1.15, temperature_lm=1.15, lm_model=lm,
        max_steps_cap=6,
    )
    out = str(tmp_path / "bundle")
    manifest = export_s2s_bundle(
        model, params, normalizer, FRONTEND, searcher, out,
        [(1, SR // 2)], lm_params=lm_params,
    )
    assert manifest["has_lm"] is True
    assert os.path.exists(os.path.join(out, "lm_params.msgpack"))

    asr = ExportedASR(out)
    rng = np.random.default_rng(2)
    wav = _rand_wav(rng, SR // 2)[None]
    lens = np.array([SR // 2], np.int32)
    toks_e, lens_e, scores_e = asr(wav, lens)

    f = compute_features(FRONTEND, jnp.asarray(wav))
    fl = jnp.minimum(
        frame_lengths(FRONTEND, jnp.asarray(lens)), f.shape[1]
    )
    f = apply_normalizer(normalizer, f)
    mo = model.apply({"params": params}, f, fl, None, train=False)
    toks_r, lens_r, scores_r = searcher(
        {"params": params}, mo["enc_out"], mo["enc_lengths"],
        ctc_log_probs=mo["ctc_log_probs"], lm_params=lm_params,
    )
    np.testing.assert_array_equal(toks_e, np.asarray(toks_r))
    np.testing.assert_array_equal(lens_e, np.asarray(lens_r))
    np.testing.assert_allclose(
        scores_e, np.asarray(scores_r), rtol=1e-5, atol=1e-5
    )


def test_streaming_bundle_matches_engine(tmp_path):
    """ExportedStreamingServer (no model code: four StableHLO fns +
    state arrays + numpy host logic) must produce EXACTLY the engine's
    transcripts across the full protocol: bootstrap first chunks,
    steady batched ticks, a steady-state flush with residual audio, a
    fresh flush (stream shorter than one chunk), and slot reuse."""
    from mamba_asr_tpu.serving.engine import StreamingServer
    from mamba_asr_tpu.serving.export import (
        ExportedStreamingServer,
        export_streaming_bundle,
    )

    model, params = _model_and_params()
    variables = {"params": params}
    hop = FRONTEND.hop
    server = StreamingServer(
        model, variables, FRONTEND, normalizer=None, n_slots=3,
        chunk_frames=16,
    )
    out = str(tmp_path / "stream_bundle")
    manifest = export_streaming_bundle(server, out)
    assert manifest["surface"] == "streaming"

    exported = ExportedStreamingServer(out)

    rng = np.random.default_rng(7)
    chunk = server.chunk_samples
    # Three stream lengths: multi-chunk + residual, exactly bootstrap +
    # residual, and shorter than one chunk (fresh flush).
    wavs = [
        _rand_wav(rng, 3 * chunk + 5 * hop + 3),
        _rand_wav(rng, chunk + hop + 1),
        _rand_wav(rng, chunk // 2 + 7),
    ]
    tiny = [  # degenerate fresh-flush lengths (< one fbank window)
        _rand_wav(rng, 5 * hop + 9),
        _rand_wav(rng, 100),
    ]

    def drive(eng):
        sids = [eng.attach() for _ in wavs]
        texts = {i: [] for i in range(len(wavs))}
        pieces = [
            [w[j: j + 1000] for j in range(0, len(w), 1000)]
            for w in wavs
        ]
        step = 0
        while any(pieces):
            for i, ps in enumerate(pieces):
                if ps:
                    eng.feed(sids[i], ps.pop(0))
            step += 1
            if step % 2 == 0:
                for sid, toks in eng.tick().items():
                    texts[sids.index(sid)].extend(toks)
        for sid, toks in eng.tick().items():
            texts[sids.index(sid)].extend(toks)
        # scrambled finish order
        for i in (1, 2, 0):
            texts[i].extend(eng.finish(sids[i]))
        # slot reuse after finish: one more short stream
        sid2 = eng.attach()
        eng.feed(sid2, wavs[0][: chunk + 11])
        reuse = list(eng.tick().get(sid2, []))
        reuse += eng.finish(sid2)
        # degenerate-tiny utterances (fresh flush below one window)
        for w in tiny:
            sid3 = eng.attach()
            eng.feed(sid3, w)
            reuse.append(tuple(eng.finish(sid3)))
        return texts, reuse

    ref_texts, ref_reuse = drive(server)
    exp_texts, exp_reuse = drive(exported)
    assert exp_texts == ref_texts
    assert exp_reuse == ref_reuse

    # The exported engine also drives the real TCP server
    # (serve.py --bundle): stream one utterance end-to-end and match
    # the engine transcript for the same audio.
    from mamba_asr_tpu.serving.server import AsrTcpServer, StreamingClient

    srv = AsrTcpServer(exported, tokenizer=None, port=0)
    srv.start()
    try:
        cl = StreamingClient(srv.host, srv.port)
        sid = cl.start()
        w = wavs[1]
        for j in range(0, len(w), 1600):
            cl.send(sid, w[j: j + 1600])
        ids, _text = cl.end(sid)
        cl.close()
    finally:
        srv.stop()
    assert list(ids) == ref_texts[1]
