"""Slot-batched serving engine: exactness vs offline, slot lifecycle.

The serving path's contract is transitive exactness: engine transcripts
== single-stream StreamingASRSession transcripts == offline greedy
decode on canonically padded features (tests/test_streaming.py). These
tests exercise the engine-specific machinery: slot batching with masked
state updates, staggered attach/feed/finish, bootstrap->steady-state
promotion, finish-time demotion, and slot reuse."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.models.streaming import StreamingASRSession
from mamba_asr_tpu.serving.engine import StreamingServer
from mamba_asr_tpu.training.trainer import FrontendConfig
import mamba_asr_tpu.ops.fbank as fb

MCFG = MambaConfig(d_state=4, d_conv=4, expand=2, scan_impl="xla")
FRONTEND = FrontendConfig(n_fft=256, n_mels=20, win_length_ms=16.0)


def _model_and_params():
    cfg = ASRConfig(
        vocab_size=9, n_mels=20, d_model=8, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=16,
        dropout=0.0, encoder_module="conmamba", kernel_size=7,
        causal=True, bidirectional=False, mamba=MCFG,
    )
    model = ASRModel(cfg)
    feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), feats, jnp.array([16]))
    return model, params


def _offline_greedy(model, params, wav: np.ndarray):
    """Offline canonical-padded greedy decode (the streaming contract's
    right-hand side, as in test_streaming_session_exact_vs_offline)."""
    from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode

    feats = fb.log_mel_spectrogram(
        jnp.asarray(wav[None]), n_fft=FRONTEND.n_fft,
        n_mels=FRONTEND.n_mels, win_length_ms=FRONTEND.win_length_ms,
    )
    extra = (-feats.shape[1]) % model.cfg.downsample
    feats = jnp.pad(feats, ((0, 0), (0, extra), (0, 0)))
    out = model.apply(params, feats, jnp.array([feats.shape[1]]))
    toks, lens = ctc_greedy_decode(out["ctc_log_probs"], out["enc_lengths"])
    return [int(t) for t in np.array(toks[0, : int(lens[0])])]


def test_engine_exact_vs_offline_staggered():
    """Three streams of different lengths, attached at different times,
    fed in ragged client-side pieces, finished in a scrambled order —
    every transcript must equal the offline decode of its own audio."""
    model, params = _model_and_params()
    hop = FRONTEND.hop
    server = StreamingServer(
        model, params, FRONTEND, n_slots=4, chunk_frames=32
    )

    rng = np.random.default_rng(3)
    # Lengths exercise: multi-chunk, sub-chunk (never promoted), and an
    # odd frame count (canonical-pad branch at finish).
    lengths = [220 * hop, 17 * hop, 149 * hop + hop // 2]
    wavs = [rng.normal(0, 0.3, size=n).astype(np.float32) for n in lengths]
    offline = [_offline_greedy(model, params, w) for w in wavs]

    sids = [server.attach(), server.attach()]  # stream 2 attaches later
    got = {0: [], 1: [], 2: []}
    cursors = [0, 0, 0]
    step = 0
    while True:
        # Ragged feeding: each live stream pushes a random-sized piece.
        for i, sid in enumerate(sids):
            if sid is None or cursors[i] >= len(wavs[i]):
                continue
            n = int(rng.integers(1, 40)) * hop // 2
            server.feed(sid, wavs[i][cursors[i]:cursors[i] + n])
            cursors[i] += n
        if step == 2:
            sids.append(server.attach())
            cursors.append(0)
        for sid_tokens, toks in server.tick().items():
            idx = next(i for i, s in enumerate(sids) if s == sid_tokens)
            got[idx].extend(toks)
        step += 1
        if all(s is None or c >= len(w)
               for s, c, w in zip(sids, cursors, wavs)):
            break

    # Finish in scrambled order; finish() drains remaining chunks.
    for i in [1, 2, 0]:
        got[i].extend(server.finish(sids[i]))

    for i in range(3):
        assert got[i] == offline[i], (i, got[i], offline[i])
    assert server.free_slots == 4


def test_engine_matches_single_session_and_reuses_slots():
    """Engine output == StreamingASRSession output for the same audio,
    and slots freed by finish() are reusable by later streams (the new
    stream's bootstrap overwrites the stale device rows)."""
    model, params = _model_and_params()
    hop = FRONTEND.hop
    server = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32
    )

    rng = np.random.default_rng(11)
    n_waves = 5  # > n_slots: forces reuse
    wavs = [
        rng.normal(0, 0.3, size=(96 + 13 * i) * hop).astype(np.float32)
        for i in range(n_waves)
    ]

    # Reference: the exact single-stream session.
    expected = []
    for w in wavs:
        sess = StreamingASRSession(model, params, FRONTEND, batch=1)
        toks = []
        for i in range(0, len(w), 32 * hop):
            toks.extend(sess.feed(w[None, i:i + 32 * hop])[0])
        toks.extend(sess.finish()[0])
        expected.append(toks)

    # Engine: two concurrent at a time, reusing slots.
    results = []
    queue = list(enumerate(wavs))
    live = {}  # sid -> (idx, cursor, tokens)
    while queue or live:
        while queue and server.free_slots:
            idx, w = queue.pop(0)
            sid = server.attach()
            live[sid] = [idx, 0, []]
        for sid, st in live.items():
            idx, cur, _ = st
            server.feed(sid, wavs[idx][cur:cur + 48 * hop])
            st[1] = cur + 48 * hop
        for sid, toks in server.tick().items():
            live[sid][2].extend(toks)
        for sid in [s for s, st in live.items()
                    if st[1] >= len(wavs[st[0]])]:
            idx, _, toks = live.pop(sid)
            toks.extend(server.finish(sid))
            results.append((idx, toks))

    for idx, toks in results:
        assert toks == expected[idx], (idx, toks, expected[idx])


def test_engine_full_and_masked_slots():
    """attach() raises when full; a starved slot (no audio buffered)
    keeps emitting nothing and its state stays correct through other
    slots' ticks (masked update)."""
    model, params = _model_and_params()
    hop = FRONTEND.hop
    server = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32
    )
    rng = np.random.default_rng(5)
    wav_a = rng.normal(0, 0.3, size=128 * hop).astype(np.float32)
    wav_b = rng.normal(0, 0.3, size=128 * hop).astype(np.float32)

    sid_a = server.attach()
    sid_b = server.attach()
    try:
        server.attach()
        assert False, "expected RuntimeError when full"
    except RuntimeError:
        pass

    got_a, got_b = [], []
    # Stream B starves (only one early chunk) while A runs many ticks
    # through the masked batch; B then resumes and must stay exact.
    server.feed(sid_b, wav_b[: 40 * hop])
    for i in range(0, len(wav_a), 32 * hop):
        server.feed(sid_a, wav_a[i:i + 32 * hop])
        for sid, toks in server.tick().items():
            (got_a if sid == sid_a else got_b).extend(toks)
    server.feed(sid_b, wav_b[40 * hop:])
    for sid, toks in server.tick().items():
        (got_a if sid == sid_a else got_b).extend(toks)
    got_a.extend(server.finish(sid_a))
    got_b.extend(server.finish(sid_b))

    assert got_a == _offline_greedy(model, params, wav_a)
    assert got_b == _offline_greedy(model, params, wav_b)


def test_engine_sharded_over_mesh_matches_unsharded():
    """Multi-chip serving: the slot batch sharded over an 8-device
    "data" mesh emits exactly what the single-device engine emits, and
    the device state is actually distributed (pure slot-parallel tick:
    zero collectives, capacity scales with devices)."""
    from mamba_asr_tpu.parallel.mesh import make_mesh

    model, params = _model_and_params()
    hop = FRONTEND.hop
    mesh = make_mesh()  # 8x1x1x1 over the virtual CPU devices
    kw = dict(n_slots=8, chunk_frames=32)
    ref = StreamingServer(model, params, FRONTEND, **kw)
    sh = StreamingServer(model, params, FRONTEND, mesh=mesh, **kw)
    assert len(sh._state["tail"].sharding.device_set) == 8

    rng = np.random.default_rng(21)
    wavs = [
        rng.normal(0, 0.3, size=(100 + 17 * i) * hop).astype(np.float32)
        for i in range(5)
    ]
    outs = []
    for server in (ref, sh):
        sids = [server.attach() for _ in wavs]
        got = {s: [] for s in sids}
        for off in range(0, max(len(w) for w in wavs), 32 * hop):
            for sid, w in zip(sids, wavs):
                server.feed(sid, w[off:off + 32 * hop])
            for sid, toks in server.tick().items():
                got[sid].extend(toks)
        for sid in sids:
            got[sid].extend(server.finish(sid))
        outs.append([got[s] for s in sids])
    assert outs[0] == outs[1]
    assert outs[0][0] == _offline_greedy(model, params, wavs[0])


def test_engine_abort_frees_slot_and_reuse_is_exact():
    """abort() reclaims a slot with zero device work — even mid-flight
    on a promoted stream — and the next occupant of that slot still
    transcribes exactly (its promote overwrites the stale state row)."""
    model, params = _model_and_params()
    hop = FRONTEND.hop
    server = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32
    )
    rng = np.random.default_rng(17)
    wav_keep = rng.normal(0, 0.3, size=130 * hop).astype(np.float32)
    wav_new = rng.normal(0, 0.3, size=110 * hop).astype(np.float32)

    sid_keep, sid_dead = server.attach(), server.attach()
    assert server.free_slots == 0
    # Promote both streams (two chunks each), then abandon one.
    got_keep = []
    for off in range(0, 64 * hop, 32 * hop):
        server.feed(sid_keep, wav_keep[off:off + 32 * hop])
        server.feed(sid_dead, wav_keep[off:off + 32 * hop])
        for sid, toks in server.tick().items():
            if sid == sid_keep:
                got_keep.extend(toks)
    server.abort(sid_dead)
    assert server.free_slots == 1

    # The freed slot serves a fresh stream exactly, while the survivor
    # keeps streaming its own audio to the exact transcript.
    sid_new = server.attach()
    got_new = []
    for off in range(0, len(wav_new), 32 * hop):
        server.feed(sid_new, wav_new[off:off + 32 * hop])
        server.feed(sid_keep, wav_keep[64 * hop + off:64 * hop + off + 32 * hop])
        for sid, toks in server.tick().items():
            (got_new if sid == sid_new else got_keep).extend(toks)
    got_new.extend(server.finish(sid_new))
    got_keep.extend(server.finish(sid_keep))
    assert got_new == _offline_greedy(model, params, wav_new)
    assert got_keep == _offline_greedy(model, params, wav_keep)
    assert server.free_slots == 2


def test_tcp_server_concurrent_clients():
    """Loopback TCP: two concurrent clients stream different audio and
    both get the exact offline transcript (partials + final)."""
    import threading

    from mamba_asr_tpu.serving.server import AsrTcpServer, StreamingClient

    model, params = _model_and_params()
    hop = FRONTEND.hop
    engine = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32
    )
    server = AsrTcpServer(engine, tokenizer=None, port=0)
    server.start()
    try:
        rng = np.random.default_rng(7)
        wavs = [
            rng.normal(0, 0.3, size=(150 + 40 * i) * hop).astype(np.float32)
            for i in range(2)
        ]
        offline = [_offline_greedy(model, params, w) for w in wavs]
        results = [None, None]

        def client_run(i):
            c = StreamingClient(server.host, server.port)
            try:
                sid = c.start()
                for off in range(0, len(wavs[i]), 40 * hop):
                    c.send(sid, wavs[i][off:off + 40 * hop])
                ids, text = c.end(sid)
                results[i] = (ids, text)
            finally:
                c.close()

        threads = [threading.Thread(target=client_run, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(2):
            assert results[i] is not None, f"client {i} did not finish"
            ids, text = results[i]
            assert ids == offline[i], (i, ids, offline[i])
            assert text is None  # no tokenizer on this server
        assert engine.free_slots == 2
    finally:
        server.stop()


def test_tcp_server_full_and_abandon():
    """A third start() on a 2-slot server gets an error event; a client
    that disconnects mid-stream has its slot reclaimed."""
    from mamba_asr_tpu.serving.server import AsrTcpServer, StreamingClient

    model, params = _model_and_params()
    hop = FRONTEND.hop
    engine = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32
    )
    server = AsrTcpServer(engine, tokenizer=None, port=0)
    server.start()
    try:
        c1 = StreamingClient(server.host, server.port)
        c2 = StreamingClient(server.host, server.port)
        sid1 = c1.start()
        c2.start()
        try:
            c2.start()
            assert False, "expected server-full error"
        except RuntimeError:
            pass
        # c2 abandons without end(): its reader-thread cleanup must free
        # the slot so a new client can attach.
        c2.close()
        deadline = __import__("time").time() + 30
        while engine.free_slots < 1 and __import__("time").time() < deadline:
            __import__("time").sleep(0.05)
        if engine.free_slots < 1:
            # Order-dependent hang seen in full-suite runs: dump every
            # thread's stack so the failure identifies the blocked one.
            import faulthandler
            import sys as _sys
            faulthandler.dump_traceback(file=_sys.stderr)
        assert engine.free_slots >= 1

        # The surviving stream still transcribes exactly.
        rng = np.random.default_rng(9)
        wav = rng.normal(0, 0.3, size=120 * hop).astype(np.float32)
        c1.send(sid1, wav)
        ids, _ = c1.end(sid1)
        assert ids == _offline_greedy(model, params, wav)
        c1.close()
    finally:
        server.stop()


def test_engine_final_ctc_beam_matches_offline_beam():
    """final_decode='ctc_beam': the whole-utterance final transcript
    must equal the offline prefix-beam decode of the same audio (the
    accumulated streamed encoder states == the offline encoder states
    for causal configs), while the streamed greedy partials keep
    flowing unchanged."""
    from mamba_asr_tpu.decoding.ctc_beam import ctc_beam_search

    model, params = _model_and_params()
    hop = FRONTEND.hop

    def offline_beam(wav):
        feats = fb.log_mel_spectrogram(
            jnp.asarray(wav[None]), n_fft=FRONTEND.n_fft,
            n_mels=FRONTEND.n_mels, win_length_ms=FRONTEND.win_length_ms,
        )
        extra = (-feats.shape[1]) % model.cfg.downsample
        feats = jnp.pad(feats, ((0, 0), (0, extra), (0, 0)))
        out = model.apply(params, feats, jnp.array([feats.shape[1]]))
        toks, lens = ctc_beam_search(
            out["ctc_log_probs"], out["enc_lengths"], beam_size=4
        )
        return [int(t) for t in np.array(toks[0, : int(lens[0])])]

    server = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32,
        final_decode="ctc_beam", beam_size=4,
    )
    rng = np.random.default_rng(23)
    wavs = [rng.normal(0, 0.3, size=(90 + 31 * i) * hop).astype(np.float32)
            for i in range(2)]
    sids = [server.attach() for _ in wavs]
    greedy = {s: [] for s in sids}
    for off in range(0, max(len(w) for w in wavs), 32 * hop):
        for sid, w in zip(sids, wavs):
            server.feed(sid, w[off:off + 32 * hop])
        for sid, toks in server.tick().items():
            greedy[sid].extend(toks)
    for sid, wav in zip(sids, wavs):
        tail, final = server.finish_final(sid)
        greedy[sid].extend(tail)
        assert final == offline_beam(wav), (final, offline_beam(wav))
        # Streamed greedy partials are the usual exact greedy stream.
        assert greedy[sid] == _offline_greedy(model, params, wav)
    assert server.free_slots == 2


def test_engine_final_s2s_beam():
    """final_decode='s2s': the joint attention/CTC beam runs over the
    accumulated encoder states at finish and must reproduce the offline
    searcher's transcript on the same audio."""
    from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher

    cfg = ASRConfig(
        vocab_size=9, n_mels=20, d_model=8, nhead=2,
        num_encoder_layers=2, num_decoder_layers=1, d_ffn=16,
        dropout=0.0, encoder_module="conmamba", decoder_module="mamba",
        kernel_size=7, causal=True, bidirectional=False, mamba=MCFG,
    )
    model = ASRModel(cfg)
    feats0 = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(1), feats0, jnp.array([16]),
        tokens_bos=jnp.zeros((1, 4), jnp.int32),
    )
    hop = FRONTEND.hop
    opts = dict(ctc_weight=0.3, ctc_candidates=4, max_steps_cap=8)

    def offline_s2s(wav):
        feats = fb.log_mel_spectrogram(
            jnp.asarray(wav[None]), n_fft=FRONTEND.n_fft,
            n_mels=FRONTEND.n_mels, win_length_ms=FRONTEND.win_length_ms,
        )
        extra = (-feats.shape[1]) % model.cfg.downsample
        feats = jnp.pad(feats, ((0, 0), (0, extra), (0, 0)))
        out = model.apply(params, feats, jnp.array([feats.shape[1]]))
        enc, lens = out["enc_out"], out["enc_lengths"]
        t = enc.shape[1]
        tb = -(-t // 128) * 128  # engine's T bucket
        enc = jnp.pad(enc, ((0, 0), (0, tb - t), (0, 0)))
        lp = jnp.pad(out["ctc_log_probs"], ((0, 0), (0, tb - t), (0, 0)))
        searcher = S2SBeamSearcher(model, beam_size=3, **opts)
        toks, hyplens, _ = searcher(params, enc, lens, ctc_log_probs=lp)
        return [int(x) for x in np.array(toks[0, : int(hyplens[0])])]

    server = StreamingServer(
        model, params, FRONTEND, n_slots=1, chunk_frames=32,
        final_decode="s2s", beam_size=3, decode_opts=opts,
    )
    rng = np.random.default_rng(29)
    wav = rng.normal(0, 0.3, size=100 * hop).astype(np.float32)
    sid = server.attach()
    for off in range(0, len(wav), 32 * hop):
        server.feed(sid, wav[off:off + 32 * hop])
        server.tick()
    _, final = server.finish_final(sid)
    assert final == offline_s2s(wav), (final, offline_s2s(wav))


def test_engine_stats_counters():
    """stats(): host-only aggregate counters stay consistent through
    attach/feed/tick/finish/abort — the serving observability surface."""
    model, params = _model_and_params()
    hop = FRONTEND.hop
    server = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32
    )
    s0 = server.stats()
    assert s0["active_streams"] == 0 and s0["ticks_total"] == 0

    rng = np.random.default_rng(31)
    wav = rng.normal(0, 0.3, size=96 * hop).astype(np.float32)
    sid_a, sid_b = server.attach(), server.attach()
    toks = 0
    for off in range(0, len(wav), 32 * hop):
        server.feed(sid_a, wav[off:off + 32 * hop])
        server.feed(sid_b, wav[off:off + 32 * hop])
        toks += sum(len(t) for t in server.tick().values())
    st = server.stats()
    assert st["active_streams"] == 2
    assert st["attached_total"] == 2
    assert st["audio_seconds_in"] == 2 * len(wav) / FRONTEND.sample_rate
    # Two bootstrap chunks went via the batch=1 path; the remaining
    # 2 streams x 2 chunks ran as batched steady rows.
    assert st["batched_rows_total"] == 4
    assert st["ticks_total"] >= 1 and st["tick_ms_avg"] > 0
    toks += len(server.finish(sid_a))
    server.abort(sid_b)
    st = server.stats()
    assert st["finished_total"] == 1 and st["aborted_total"] == 1
    assert st["active_streams"] == 0
    assert st["tokens_out"] >= toks - len(server._pending.get(sid_a, []))


def test_engine_final_times_matches_offline_alignment():
    """finish_final(want_times=True): the greedy token spans over the
    accumulated streamed encoder states equal the offline
    ctc_greedy_decode_with_times alignment of the same audio."""
    from mamba_asr_tpu.decoding.ctc_greedy import (
        ctc_greedy_decode_with_times,
    )

    model, params = _model_and_params()
    hop = FRONTEND.hop

    def offline_spans(wav):
        feats = fb.log_mel_spectrogram(
            jnp.asarray(wav[None]), n_fft=FRONTEND.n_fft,
            n_mels=FRONTEND.n_mels, win_length_ms=FRONTEND.win_length_ms,
        )
        extra = (-feats.shape[1]) % model.cfg.downsample
        feats = jnp.pad(feats, ((0, 0), (0, extra), (0, 0)))
        out = model.apply(params, feats, jnp.array([feats.shape[1]]))
        ids, n, ons, offs, confs = ctc_greedy_decode_with_times(
            out["ctc_log_probs"], out["enc_lengths"]
        )
        k = int(n[0])
        return [
            (int(ids[0, i]), int(ons[0, i]), int(offs[0, i]),
             float(confs[0, i]))
            for i in range(k)
        ]

    server = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32,
        final_decode="ctc_beam", beam_size=4,
    )
    rng = np.random.default_rng(29)
    wav = rng.normal(0, 0.3, size=141 * hop).astype(np.float32)
    sid = server.attach()
    for off in range(0, len(wav), 32 * hop):
        server.feed(sid, wav[off:off + 32 * hop])
        server.tick()
    tail, final, spans = server.finish_final(sid, want_times=True)
    exp = offline_spans(wav)
    assert [sp[:3] for sp in spans] == [sp[:3] for sp in exp], (spans, exp)
    np.testing.assert_allclose(
        [sp[3] for sp in spans], [sp[3] for sp in exp], rtol=1e-5
    )
    assert all(0 < sp[3] <= 1.0 + 1e-6 for sp in spans)
    assert spans, "alignment produced no tokens (degenerate test input)"
    assert server.frame_seconds > 0


def test_tcp_timestamps():
    """end(timestamps=True) over the wire returns greedy-aligned word
    times consistent with the offline greedy transcript."""
    from mamba_asr_tpu.data.tokenizer import CharTokenizer
    from mamba_asr_tpu.serving.server import AsrTcpServer, StreamingClient

    model, params = _model_and_params()
    hop = FRONTEND.hop
    tok = CharTokenizer(["A", "B", " ", "C", "D"])  # vocab 9 == model
    engine = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32,
        final_decode="ctc_beam", beam_size=4,
    )
    server = AsrTcpServer(engine, tokenizer=tok, port=0)
    server.start()
    try:
        rng = np.random.default_rng(31)
        wav = rng.normal(0, 0.3, size=160 * hop).astype(np.float32)
        expected_words = tok.decode(
            _offline_greedy(model, params, wav)
        ).split()
        c = StreamingClient(server.host, server.port)
        try:
            sid = c.start()
            for off in range(0, len(wav), 40 * hop):
                c.send(sid, wav[off:off + 40 * hop])
            ids, text, words = c.end(sid, timestamps=True)
        finally:
            c.close()
        assert words is not None
        assert [w[0] for w in words] == expected_words, (
            words, expected_words
        )
        prev_start = 0.0
        for w, s, e, conf in words:
            assert isinstance(w, str) and w
            assert 0.0 <= s <= e, (s, e)
            assert s >= prev_start, (s, prev_start)  # starts ordered
            assert 0.0 < conf <= 1.0 + 1e-6, conf
            prev_start = s
        assert e <= len(wav) / FRONTEND.sample_rate + 1.0
    finally:
        server.stop()


def test_engine_trailing_silence_matches_offline_argmax():
    """Endpointing bookkeeping: after each steady tick, the engine's
    trailing-silence frame count equals the trailing blank run of the
    OFFLINE per-frame argmax over the frames processed so far (streamed
    argmax == offline argmax for causal configs)."""
    model, params = _model_and_params()
    hop = FRONTEND.hop
    chunk_frames = 32
    ds = model.cfg.downsample
    ef = chunk_frames // ds  # encoder frames per chunk

    server = StreamingServer(
        model, params, FRONTEND, n_slots=1, chunk_frames=chunk_frames
    )
    rng = np.random.default_rng(37)
    n_chunks = 6
    wav = rng.normal(0, 0.3, size=n_chunks * chunk_frames * hop).astype(
        np.float32
    )

    # Offline per-frame argmax on the same canonically padded audio.
    feats = fb.log_mel_spectrogram(
        jnp.asarray(wav[None]), n_fft=FRONTEND.n_fft,
        n_mels=FRONTEND.n_mels, win_length_ms=FRONTEND.win_length_ms,
    )
    extra = (-feats.shape[1]) % ds
    feats = jnp.pad(feats, ((0, 0), (0, extra), (0, 0)))
    out = model.apply(params, feats, jnp.array([feats.shape[1]]))
    offline_best = np.asarray(jnp.argmax(out["ctc_log_probs"], -1))[0]

    sid = server.attach()
    expected = None
    for k in range(n_chunks):
        server.feed(
            sid, wav[k * chunk_frames * hop:(k + 1) * chunk_frames * hop]
        )
        emitted = server.tick()
        if k == 0:
            # Bootstrap chunk: emission-proxy semantics.
            expected = 0 if emitted.get(sid) else ef
        else:
            row = offline_best[k * ef:(k + 1) * ef]
            nz = np.nonzero(row != 0)[0]
            if nz.size:
                expected = len(row) - 1 - int(nz[-1])
            else:
                expected += len(row)
        got = server.trailing_silence_s(sid) / server.frame_seconds
        assert round(got) == expected, (k, got, expected)
    server.finish(sid)


def test_tcp_endpoint_event():
    """A server with endpoint_silence_s emits one endpoint event per
    silence run; the client surfaces it via wait_endpoint()."""
    from mamba_asr_tpu.serving.server import AsrTcpServer, StreamingClient

    model, params = _model_and_params()
    hop = FRONTEND.hop
    engine = StreamingServer(
        model, params, FRONTEND, n_slots=2, chunk_frames=32
    )
    server = AsrTcpServer(engine, tokenizer=None, port=0,
                          endpoint_silence_s=0.5)
    # Force the signal deterministically: the plumbing under test is the
    # server's event emission + client delivery, not the (separately
    # tested) engine bookkeeping.
    engine.trailing_silence_s = lambda sid: 9.0
    server.start()
    try:
        rng = np.random.default_rng(41)
        wav = rng.normal(0, 0.3, size=96 * hop).astype(np.float32)
        c = StreamingClient(server.host, server.port)
        try:
            sid = c.start()
            assert c.endpoint_seen(sid) is None
            for off in range(0, len(wav), 32 * hop):
                c.send(sid, wav[off:off + 32 * hop])
            sil = c.wait_endpoint(sid, timeout=60)
            assert sil == 9.0, sil
            ids, text = c.end(sid)
            assert ids == _offline_greedy(model, params, wav)
        finally:
            c.close()
    finally:
        server.stop()


def test_engine_final_ctc_beam_lm_rescoring():
    """final_decode='ctc_beam' with an LM: the final transcript equals
    the offline CTC n-best + LM rescore of the same audio (the
    reference's decode-time LM, served)."""
    from mamba_asr_tpu.decoding.ctc_beam import ctc_beam_search_nbest
    from mamba_asr_tpu.decoding.rescore import rescore_nbest
    from mamba_asr_tpu.models.lm import TransformerLM

    model, params = _model_and_params()
    hop = FRONTEND.hop
    lm = TransformerLM(vocab_size=9, d_model=16, nhead=2, num_layers=1,
                       d_ffn=16)
    lm_params = {"params": lm.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 4), jnp.int32)
    )["params"]}

    def offline(wav):
        feats = fb.log_mel_spectrogram(
            jnp.asarray(wav[None]), n_fft=FRONTEND.n_fft,
            n_mels=FRONTEND.n_mels, win_length_ms=FRONTEND.win_length_ms,
        )
        extra = (-feats.shape[1]) % model.cfg.downsample
        feats = jnp.pad(feats, ((0, 0), (0, extra), (0, 0)))
        out = model.apply(params, feats, jnp.array([feats.shape[1]]))
        toks, lens, scores = ctc_beam_search_nbest(
            out["ctc_log_probs"], out["enc_lengths"],
            nbest=4, beam_size=4,
        )
        bt, bl = rescore_nbest(toks, lens, scores, lm, lm_params,
                               lm_weight=0.6)
        return [int(t) for t in np.array(bt[0, : int(bl[0])])]

    server = StreamingServer(
        model, params, FRONTEND, n_slots=1, chunk_frames=32,
        final_decode="ctc_beam", beam_size=4,
        lm_model=lm, lm_params=lm_params,
        decode_opts={"lm_weight": 0.6, "nbest": 4},
    )
    rng = np.random.default_rng(43)
    wav = rng.normal(0, 0.3, size=133 * hop).astype(np.float32)
    sid = server.attach()
    for off in range(0, len(wav), 32 * hop):
        server.feed(sid, wav[off:off + 32 * hop])
        server.tick()
    _, final = server.finish_final(sid)
    assert final == offline(wav), (final, offline(wav))
