"""TCP streaming-ASR server and client over the slot-batched engine.

Wire protocol (both directions): 8-byte big-endian header
`(json_len: u32, bin_len: u32)`, then `json_len` bytes of UTF-8 JSON and
`bin_len` bytes of binary payload (float32 mono PCM at the model's
sample rate).

Client -> server ops:
  {"op": "start"}                 -> {"event": "started", "sid": N}
                                     (or {"event": "error", ...} when full)
  {"op": "audio", "sid": N} + PCM -> buffered; tokens stream back
  {"op": "end",   "sid": N}       -> {"event": "tokens", ..., "final": true}

Server -> client events:
  {"event": "tokens", "sid": N, "ids": [...], "final": bool}
  — partial emissions as the engine ticks; the final frame additionally
  carries "text" (full-utterance decode) when the server has a tokenizer.

The engine is single-threaded by design (one device client); all engine
calls serialize behind one lock, and a ticker thread advances every
ready stream between client requests. Latency note: on this
environment's tunneled device a dispatch costs ~250 ms, so per-tick
latency here is dispatch-bound; on a real co-located TPU host the tick
is the numbers in scripts/bench_serving.py.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from mamba_asr_tpu.serving.engine import StreamingServer

_HEADER = struct.Struct(">II")


def send_frame(sock: socket.socket, obj: dict, payload: bytes = b"") -> None:
    body = json.dumps(obj).encode("utf-8")
    sock.sendall(_HEADER.pack(len(body), len(payload)) + body + payload)


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        if not part:
            return None
        buf += part
    return buf


def recv_frame(sock: socket.socket) -> Optional[Tuple[dict, bytes]]:
    head = _recv_exact(sock, _HEADER.size)
    if head is None:
        return None
    jlen, blen = _HEADER.unpack(head)
    body = _recv_exact(sock, jlen)
    if body is None:
        return None
    payload = _recv_exact(sock, blen) if blen else b""
    if blen and payload is None:
        return None
    return json.loads(body.decode("utf-8")), payload


class AsrTcpServer:
    """Serve a StreamingServer engine over TCP."""

    def __init__(
        self,
        engine: StreamingServer,
        tokenizer=None,
        host: str = "127.0.0.1",
        port: int = 0,
        tick_idle_s: float = 0.002,
        endpoint_silence_s: float = 0.0,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.tick_idle_s = tick_idle_s
        # > 0 enables endpoint events: once a stream's trailing CTC
        # silence exceeds this, the client gets one {"event":
        # "endpoint"} (re-armed by any later token) and decides whether
        # to end the stream — server-side VAD-free endpointing.
        self.endpoint_silence_s = endpoint_silence_s
        self._endpoint_sent: Dict[int, bool] = {}
        self._lock = threading.Lock()
        self._conn_of_sid: Dict[int, socket.socket] = {}
        self._ids_of_sid: Dict[int, List[int]] = {}
        self._send_locks: Dict[socket.socket, threading.Lock] = {}
        self._listener = socket.create_server((host, port))
        self.host, self.port = self._listener.getsockname()[:2]
        self._running = False
        self._threads: List[threading.Thread] = []

    # -- lifecycle -----------------------------------------------------
    def start(self) -> None:
        self._running = True
        for fn in (self._accept_loop, self._tick_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._running = False
        try:
            self._listener.close()
        except OSError:
            pass
        for t in self._threads:
            t.join(timeout=5)

    # -- internals -----------------------------------------------------
    def _send(self, conn: socket.socket, obj: dict) -> None:
        lock = self._send_locks.setdefault(conn, threading.Lock())
        try:
            with lock:
                send_frame(conn, obj)
        except OSError:
            pass  # client went away; finish/cleanup happens via its reader

    def _accept_loop(self) -> None:
        while self._running:
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            t = threading.Thread(
                target=self._client_loop, args=(conn,), daemon=True
            )
            t.start()
            self._threads.append(t)

    def _tick_loop(self) -> None:
        import time

        while self._running:
            # Dispatch stays under the engine lock so a concurrent "end"
            # (which also takes the lock) can never send its final frame
            # ahead of this tick's partials on the same connection.
            with self._lock:
                ready = self.engine.ready_slots()
                emitted = self.engine.tick() if ready else {}
                for sid, ids in emitted.items():
                    self._ids_of_sid.setdefault(sid, []).extend(ids)
                    if ids:
                        self._endpoint_sent[sid] = False  # re-arm
                    conn = self._conn_of_sid.get(sid)
                    if conn is not None and ids:
                        self._send(conn, {
                            "event": "tokens", "sid": sid,
                            "ids": ids, "final": False,
                        })
                if self.endpoint_silence_s > 0 and ready:
                    for sid, conn in list(self._conn_of_sid.items()):
                        if self._endpoint_sent.get(sid):
                            continue
                        try:
                            sil = self.engine.trailing_silence_s(sid)
                        except KeyError:
                            continue  # finished concurrently
                        if sil >= self.endpoint_silence_s:
                            self._endpoint_sent[sid] = True
                            self._send(conn, {
                                "event": "endpoint", "sid": sid,
                                "silence_s": round(sil, 3),
                            })
            if not ready:
                time.sleep(self.tick_idle_s)

    def _client_loop(self, conn: socket.socket) -> None:
        sids_here: List[int] = []
        try:
            while self._running:
                frame = recv_frame(conn)
                if frame is None:
                    break
                msg, payload = frame
                op = msg.get("op")
                if op == "start":
                    try:
                        with self._lock:
                            sid = self.engine.attach()
                        self._conn_of_sid[sid] = conn
                        self._ids_of_sid[sid] = []
                        sids_here.append(sid)
                        self._send(conn, {"event": "started", "sid": sid})
                    except RuntimeError as e:
                        self._send(conn, {"event": "error", "msg": str(e)})
                elif op == "audio":
                    samples = np.frombuffer(payload, np.float32)
                    with self._lock:
                        self.engine.feed(msg["sid"], samples)
                elif op == "end":
                    sid = msg["sid"]
                    final_ids = spans = None
                    want_times = bool(msg.get("timestamps")) and (
                        self.engine.final_decode is not None
                    )
                    with self._lock:
                        if want_times:
                            tail, final_ids, spans = (
                                self.engine.finish_final(
                                    sid, want_times=True
                                )
                            )
                        elif self.engine.final_decode is not None:
                            tail, final_ids = self.engine.finish_final(sid)
                        else:
                            tail = self.engine.finish(sid)
                        all_ids = self._ids_of_sid.pop(sid, []) + tail
                    self._conn_of_sid.pop(sid, None)
                    self._endpoint_sent.pop(sid, None)
                    if sid in sids_here:
                        sids_here.remove(sid)
                    out = {"event": "tokens", "sid": sid, "ids": tail,
                           "final": True}
                    if final_ids is not None:
                        # Whole-utterance final-pass beam transcript —
                        # supersedes the streamed greedy partials.
                        out["ids_final"] = final_ids
                    if self.tokenizer is not None:
                        out["text"] = self.tokenizer.decode(
                            final_ids if final_ids is not None else all_ids
                        )
                    if spans is not None and self.tokenizer is not None:
                        from mamba_asr_tpu.decoding.timestamps import (
                            word_timestamps,
                        )

                        out["words"] = [
                            list(entry) for entry in word_timestamps(
                                [sp[0] for sp in spans],
                                [sp[1] for sp in spans],
                                [sp[2] for sp in spans],
                                self.tokenizer,
                                self.engine.frame_seconds,
                                confs=[sp[3] for sp in spans],
                            )
                        ]
                    self._send(conn, out)
                elif op == "stats":
                    with self._lock:
                        st = self.engine.stats()
                    self._send(conn, {"event": "stats", "stats": st})
                else:
                    self._send(conn, {"event": "error",
                                      "msg": f"unknown op {op!r}"})
        finally:
            # Free any streams the client abandoned — abort, not finish:
            # slot reclaim is host-only and immediate, with no flush
            # dispatch spent on a client that will never read the result.
            for sid in sids_here:
                with self._lock:
                    try:
                        self.engine.abort(sid)
                    except KeyError:
                        pass
                self._conn_of_sid.pop(sid, None)
                self._ids_of_sid.pop(sid, None)
                self._endpoint_sent.pop(sid, None)
            try:
                conn.close()
            except OSError:
                pass


class StreamingClient:
    """Minimal client: start() a stream, send() PCM, end() -> transcript."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port))
        self._started: "List[int]" = []
        self._start_evt = threading.Event()
        self._partials: Dict[int, List[int]] = {}
        self._final: Dict[int, List[int]] = {}
        self._final_beam: Dict[int, Optional[List[int]]] = {}
        self._text: Dict[int, Optional[str]] = {}
        self._final_evt: Dict[int, threading.Event] = {}
        self._words: Dict[int, Optional[list]] = {}
        self._endpoints: Dict[int, float] = {}
        self._endpoint_evt = threading.Event()
        self._stats: Optional[dict] = None
        self._stats_evt = threading.Event()
        self._error: Optional[str] = None
        self._send_lock = threading.Lock()
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def _read_loop(self) -> None:
        while True:
            try:
                frame = recv_frame(self.sock)
            except OSError:
                return  # local close() while blocked in recv
            if frame is None:
                return
            msg, _ = frame
            ev = msg.get("event")
            if ev == "started":
                self._started.append(msg["sid"])
                self._start_evt.set()
            elif ev == "tokens":
                sid = msg["sid"]
                if msg.get("final"):
                    self._final[sid] = msg["ids"]
                    self._final_beam[sid] = msg.get("ids_final")
                    self._text[sid] = msg.get("text")
                    self._words[sid] = msg.get("words")
                    self._final_evt.setdefault(sid, threading.Event()).set()
                else:
                    self._partials.setdefault(sid, []).extend(msg["ids"])
            elif ev == "endpoint":
                self._endpoints[msg["sid"]] = msg.get("silence_s", 0.0)
                self._endpoint_evt.set()
            elif ev == "stats":
                self._stats = msg["stats"]
                self._stats_evt.set()
            elif ev == "error":
                self._error = msg.get("msg", "server error")
                self._start_evt.set()

    def _send(self, obj: dict, payload: bytes = b"") -> None:
        with self._send_lock:
            send_frame(self.sock, obj, payload)

    def start(self, timeout: float = 30.0) -> int:
        self._start_evt.clear()
        self._send({"op": "start"})
        if not self._start_evt.wait(timeout):
            raise TimeoutError("no start reply")
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(err)
        sid = self._started.pop(0)
        self._final_evt[sid] = threading.Event()
        return sid

    def send(self, sid: int, samples: np.ndarray) -> None:
        pcm = np.asarray(samples, np.float32).tobytes()
        self._send({"op": "audio", "sid": sid}, pcm)

    def partial_ids(self, sid: int) -> List[int]:
        return list(self._partials.get(sid, []))

    def end(self, sid: int, timeout: float = 600.0, timestamps: bool = False):
        """Finish the stream; returns (all_token_ids, text_or_None) — or
        (ids, text, words) with timestamps=True, where words is the
        server's greedy-aligned [[word, start_s, end_s], ...] (requires
        the server to run a final-pass decode). When the server runs a
        final-pass beam decode, the returned ids are its whole-utterance
        transcript (superseding the streamed greedy partials)."""
        self._send({"op": "end", "sid": sid, "timestamps": timestamps})
        if not self._final_evt[sid].wait(timeout):
            raise TimeoutError("no final reply")
        self._endpoints.pop(sid, None)
        beam = self._final_beam.pop(sid, None)
        ids = self._partials.pop(sid, []) + self._final.pop(sid)
        if beam is not None:
            ids = beam
        text = self._text.pop(sid)
        if timestamps:
            return ids, text, self._words.pop(sid, None)
        self._words.pop(sid, None)
        return ids, text

    def endpoint_seen(self, sid: int):
        """Trailing-silence endpoint signal for stream `sid`, or None.
        Servers started with endpoint_silence_s > 0 emit it once per
        silence run; a typical client ends the stream on it."""
        return self._endpoints.get(sid)

    def wait_endpoint(self, sid: int, timeout: float = 30.0):
        """Block until an endpoint event arrives for `sid` (returns its
        silence_s) or the timeout passes (returns None)."""
        deadline = __import__("time").time() + timeout
        while True:
            if sid in self._endpoints:
                return self._endpoints[sid]
            remaining = deadline - __import__("time").time()
            if remaining <= 0:
                return None
            self._endpoint_evt.clear()
            self._endpoint_evt.wait(min(remaining, 0.5))

    def stats(self, timeout: float = 30.0) -> dict:
        """Fetch the server's aggregate serving counters."""
        self._stats_evt.clear()
        self._send({"op": "stats"})
        if not self._stats_evt.wait(timeout):
            raise TimeoutError("no stats reply")
        return self._stats

    def close(self) -> None:
        # shutdown() BEFORE close(): with the reader thread parked in
        # recv, bare close() never releases the file description (the
        # in-flight syscall holds it), so no FIN reaches the server and
        # the abandoned slot is never reclaimed — the root cause of the
        # order-dependent test_tcp_server_full_and_abandon hang
        # (empirically verified: close-only leaves the peer recv blocked
        # indefinitely; shutdown delivers FIN immediately).
        try:
            self.sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass
