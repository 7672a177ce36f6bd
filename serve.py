#!/usr/bin/env python
"""Streaming ASR server: N concurrent real-time streams on one chip.

Server (owns the accelerator; one process per chip):

    python serve.py <hparams.yaml> --ckpt_dir results/.../save \
        [--host 127.0.0.1] [--port 7353] [--slots 8] [--chunk_frames 64]

Client (no jax needed; streams PCM over TCP and prints transcripts):

    python serve.py --connect HOST:PORT audio1.flac audio2.wav \
        [--realtime]

The reference framework has no serving path (inference is the offline
test-set loop, /root/reference/train_CTC.py:233-270); this is the
deployment surface on top of the slot-batched engine
(mamba_asr_tpu/serving/engine.py): one compiled fixed-shape tick
advances every ready stream per dispatch, so per-stream cost falls as
slots fill. Transcripts are exactly the offline greedy decode for
causal configs (tests/test_serving.py, tests/test_streaming.py).
"""

from __future__ import annotations

import argparse
import sys
import time


def run_client(addr: str, paths, realtime: bool, chunk_ms: float,
               timestamps: bool = False) -> None:
    import numpy as np

    from mamba_asr_tpu.data.audio import read_audio
    from mamba_asr_tpu.serving.server import StreamingClient

    host, port = addr.rsplit(":", 1)
    client = StreamingClient(host, int(port))
    try:
        for path in paths:
            wav, sr = read_audio(path)
            sid = client.start()
            step = max(1, int(sr * chunk_ms / 1000))
            for off in range(0, len(wav), step):
                client.send(sid, wav[off : off + step])
                if realtime:
                    time.sleep(chunk_ms / 1000)
            words = None
            if timestamps:
                ids, text, words = client.end(sid, timestamps=True)
            else:
                ids, text = client.end(sid)
            out = text if text is not None else " ".join(map(str, ids))
            print(f"{path}\t{out}")
            for w, s, e, conf in words or []:
                print(f"{s:.3f}\t{e:.3f}\t{conf:.3f}\t{w}")
    finally:
        client.close()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", nargs="?", default="",
                   help="hparams yaml (server mode) or first audio file "
                        "(client mode)")
    p.add_argument("--connect", default="",
                   help="HOST:PORT — run as client against a live server")
    p.add_argument("--realtime", action="store_true",
                   help="client: pace audio at real time instead of "
                        "as-fast-as-possible")
    p.add_argument("--client_chunk_ms", type=float, default=320.0)
    p.add_argument("--timestamps", action="store_true",
                   help="client: also print greedy-aligned word times "
                        "(needs a server running a final-pass decode)")
    p.add_argument("--ckpt_dir", default="",
                   help="experiment save dir (top-k averaged restore)")
    p.add_argument("--bundle", default="",
                   help="serve a streaming StableHLO bundle "
                        "(export_streaming_bundle) — no hparams/ckpt/"
                        "model code needed; greedy transcripts exactly "
                        "equal the framework engine's")
    p.add_argument("--torch_ckpt", default="",
                   help="reference PyTorch model.ckpt to serve "
                        "(models/torch_import.py)")
    p.add_argument("--torch_normalizer", default="")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7353)
    p.add_argument("--slots", type=int, default=8,
                   help="concurrent-stream capacity (compiled batch size)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the slot batch over N devices "
                        "(multi-chip serving; 0 = single device)")
    p.add_argument("--chunk_frames", type=int, default=64,
                   help="feature frames per stream per tick (64 = 640 ms)")
    p.add_argument("--final", choices=["none", "ctc_beam", "s2s"],
                   default="none",
                   help="final-pass decode at stream end: whole-"
                        "utterance beam over the accumulated encoder "
                        "states (partials stay greedy)")
    p.add_argument("--final_beam_size", type=int, default=8)
    p.add_argument("--endpoint_silence", type=float, default=0.0,
                   help="server: emit an endpoint event to the client "
                        "once a stream's trailing CTC silence exceeds "
                        "this many seconds (0 = off)")
    args, extra = p.parse_known_args()

    if args.connect:
        # Client mode: every remaining positional is an audio file.
        paths = ([args.config] if args.config else []) + [
            a for a in extra if not a.startswith("-")
        ]
        if not paths:
            raise SystemExit("client mode needs audio files")
        run_client(args.connect, paths, args.realtime, args.client_chunk_ms,
                   timestamps=args.timestamps)
        return

    if args.bundle:
        # Framework-free serving from an exported bundle: numpy host
        # logic + four StableHLO functions; slots/chunk are baked in at
        # export time.
        from mamba_asr_tpu.data.tokenizer import load_tokenizer
        from mamba_asr_tpu.serving.export import ExportedStreamingServer
        from mamba_asr_tpu.serving.server import AsrTcpServer

        engine = ExportedStreamingServer(args.bundle)
        tokenizer = load_tokenizer(args.tokenizer) if args.tokenizer else None
        server = AsrTcpServer(engine, tokenizer=tokenizer,
                              host=args.host, port=args.port,
                              endpoint_silence_s=args.endpoint_silence)
        server.start()
        print(f"serving bundle {args.bundle} "
              f"({engine.m['n_slots']} slots) on "
              f"{server.host}:{server.port}", flush=True)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.stop()
        return

    if not args.config:
        raise SystemExit("server mode needs an hparams yaml "
                         "(or use --connect for client mode)")

    from mamba_asr_tpu.cli import restore_asr_state
    from mamba_asr_tpu.configs.loader import load_config, parse_overrides
    from mamba_asr_tpu.data.tokenizer import load_tokenizer
    from mamba_asr_tpu.serving.engine import StreamingServer
    from mamba_asr_tpu.serving.server import AsrTcpServer

    cfg = load_config(args.config, parse_overrides(extra))
    tok_path = (args.tokenizer
                or f"{cfg.output_folder}/tokenizer_{cfg.data.tokenizer_type}.json")
    tokenizer = load_tokenizer(tok_path)
    model, state = restore_asr_state(
        cfg, ckpt_dir=args.ckpt_dir, torch_ckpt=args.torch_ckpt,
        torch_normalizer=args.torch_normalizer,
    )
    if not cfg.model.causal:
        print("warning: non-causal config — streamed transcripts are "
              "chunk-approximate, not offline-exact (use causal: true "
              "for the exactness contract)", file=sys.stderr)

    mesh = None
    if args.data_parallel > 1:
        from mamba_asr_tpu.parallel.mesh import make_mesh
        import jax

        mesh = make_mesh(
            data=args.data_parallel,
            devices=jax.devices()[: args.data_parallel],
        )
    lm_model = lm_params = None
    if args.final == "ctc_beam" and cfg.decode.lm_path:
        # CTC n-best + LM rescoring on the final pass (the reference's
        # decode-time LM, served): loads cfg.decode.lm_path (native or
        # imported torch checkpoint, cli.load_lm).
        from mamba_asr_tpu.cli import load_lm

        lm_model, lm_params = load_lm(cfg, tokenizer)
    engine = StreamingServer(
        model, {"params": state.params}, cfg.frontend,
        normalizer=state.normalizer, n_slots=args.slots,
        chunk_frames=args.chunk_frames, mesh=mesh,
        final_decode=None if args.final == "none" else args.final,
        beam_size=args.final_beam_size,
        lm_model=lm_model, lm_params=lm_params,
        decode_opts=(
            {"lm_weight": cfg.decode.lm_weight,
             "temperature_lm": cfg.decode.temperature_lm}
            if lm_model is not None else None
        ),
    )
    server = AsrTcpServer(engine, tokenizer=tokenizer,
                          host=args.host, port=args.port,
                          endpoint_silence_s=args.endpoint_silence)
    server.start()
    print(f"serving {args.slots} slots on {server.host}:{server.port}",
          flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
