"""Evaluation metrics: WER/CER (Levenshtein alignment) and accuracy.

Reference: speechbrain.utils.metric_stats.ErrorRateStats (WER + CER via
split_tokens) and AccuracyStats, configured at
/root/reference/hparams/CTC/conmamba_large.yaml:344-346 and
/root/reference/hparams/S2S/conmamba_large.yaml:470-471, with the
per-utterance alignment dump `wer_metric.write_stats(w)`
(/root/reference/train_CTC.py:664-666).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, TextIO, Tuple

import numpy as np


def edit_distance_counts(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int]:
    """(substitutions, insertions, deletions) of the optimal alignment.

    Dispatches to the native C++ DP (native/edit_distance.cpp) when the
    library builds; this pure-Python version is the fallback and oracle.
    """
    native_counts = _native_edit_distance(ref, hyp)
    if native_counts is not None:
        return native_counts
    return _edit_distance_counts_py(ref, hyp)


def _native_edit_distance(ref, hyp) -> Optional[Tuple[int, int, int]]:
    try:
        import ctypes

        from mamba_asr_tpu import native

        lib = native.edit_distance_lib()
        if lib is None:
            return None
        vocab: dict = {}

        def ids(seq):
            return np.asarray(
                [vocab.setdefault(t, len(vocab)) for t in seq], np.int32
            )

        r, h = ids(ref), ids(hyp)
        out = np.zeros(3, np.int64)
        lib.edit_distance_counts(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return int(out[0]), int(out[1]), int(out[2])
    except Exception:
        return None


def _edit_distance_counts_py(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int]:
    """Pure-Python fallback/oracle."""
    n, m = len(ref), len(hyp)
    # dp[j] = (cost, subs, ins, dels) over hyp prefix j
    prev = [(j, 0, j, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i)]
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = [(prev[j - 1][0], prev[j - 1])]
            else:
                cand = [(prev[j - 1][0] + 1, prev[j - 1], "s")]
            cand.append((cur[j - 1][0] + 1, cur[j - 1], "i"))
            cand.append((prev[j][0] + 1, prev[j], "d"))
            best = min(cand, key=lambda c: c[0])
            cost, parent = best[0], best[1]
            s, ins, d = parent[1], parent[2], parent[3]
            if len(best) == 3:
                if best[2] == "s":
                    s += 1
                elif best[2] == "i":
                    ins += 1
                else:
                    d += 1
            cur.append((cost, s, ins, d))
        prev = cur
    _, s, ins, d = prev[m]
    return s, ins, d


def align_tokens(
    ref: Sequence, hyp: Sequence
) -> List[Tuple[str, Optional[object], Optional[object]]]:
    """Optimal-alignment backtrace: list of (op, ref_tok, hyp_tok) with op
    in {"=", "S", "I", "D"} (I -> ref_tok None; D -> hyp_tok None).

    Powers the token-level wer-file markup (SpeechBrain
    ErrorRateStats.write_stats behavior, dumped at
    /root/reference/train_CTC.py:664-666)."""
    n, m = len(ref), len(hyp)
    # Row-vectorized DP (whole test sets go through write_stats; the
    # O(n*m) pure-Python inner loop was the bottleneck there). The
    # insertion recurrence cur[j] = min(tmp[j], cur[j-1] + 1) resolves
    # in closed form as a running minimum of tmp[j] - j.
    hyp_arr = np.asarray(hyp) if m else np.zeros((0,))
    ptr = np.zeros((n + 1, m + 1), np.int8)  # 0:=, 1:S, 2:I, 3:D
    ptr[1:, 0] = 3
    ptr[0, 1:] = 2
    prev = np.arange(m + 1)
    j_idx = np.arange(m + 1)
    for i in range(1, n + 1):
        eq = hyp_arr == ref[i - 1]
        diag = prev[:-1] + (~eq)
        dele = prev[1:] + 1
        tmp = np.concatenate(([i], np.minimum(diag, dele)))
        cur = np.minimum.accumulate(tmp - j_idx) + j_idx
        # Tie-break priority (diag > ins > del) matches the scalar DP.
        ins = cur[:-1] + 1
        row = np.where(
            cur[1:] == diag, np.where(eq, 0, 1),
            np.where(cur[1:] == ins, 2, 3),
        )
        ptr[i, 1:] = row
        prev = cur
    ops = []
    i, j = n, m
    while i > 0 or j > 0:
        p = ptr[i, j]
        if p == 0 and i > 0 and j > 0:
            ops.append(("=", ref[i - 1], hyp[j - 1])); i -= 1; j -= 1
        elif p == 1:
            ops.append(("S", ref[i - 1], hyp[j - 1])); i -= 1; j -= 1
        elif p == 2:
            ops.append(("I", None, hyp[j - 1])); j -= 1
        else:
            ops.append(("D", ref[i - 1], None)); i -= 1
    return ops[::-1]


@dataclasses.dataclass
class ErrorRateStats:
    """Accumulates WER (or CER with split_tokens=True) across utterances."""

    split_tokens: bool = False
    scores: List[dict] = dataclasses.field(default_factory=list)

    def append(
        self,
        ids: Sequence[str],
        predictions: Sequence[str],
        targets: Sequence[str],
    ) -> None:
        for uid, hyp, ref in zip(ids, predictions, targets):
            if self.split_tokens:
                r, h = list(ref.replace(" ", "")), list(hyp.replace(" ", ""))
            else:
                r, h = ref.split(), hyp.split()
            s, i, d = edit_distance_counts(r, h)
            self.scores.append(
                {
                    "id": uid,
                    "ref": ref,
                    "hyp": hyp,
                    "num_ref": len(r),
                    "sub": s,
                    "ins": i,
                    "del": d,
                    "err": s + i + d,
                }
            )

    def summarize(self) -> dict:
        n_ref = sum(s["num_ref"] for s in self.scores) or 1
        err = sum(s["err"] for s in self.scores)
        return {
            "WER": 100.0 * err / n_ref,
            "num_ref_tokens": n_ref,
            "substitutions": sum(s["sub"] for s in self.scores),
            "insertions": sum(s["ins"] for s in self.scores),
            "deletions": sum(s["del"] for s in self.scores),
            "num_utterances": len(self.scores),
        }

    def write_stats(self, f: TextIO) -> None:
        """Summary + per-utterance token-level alignment markup (the
        SpeechBrain wer-file format: aligned ref/op/hyp rows with <eps>
        fillers for insertions/deletions)."""
        summary = self.summarize()
        f.write(
            "%WER {WER:.2f} [ {substitutions} sub, {insertions} ins, "
            "{deletions} del on {num_ref_tokens} ref tokens, "
            "{num_utterances} utts ]\n".format(**summary)
        )
        f.write("=" * 70 + "\n")
        for s in sorted(self.scores, key=lambda x: -x["err"]):
            if self.split_tokens:
                r = list(s["ref"].replace(" ", ""))
                h = list(s["hyp"].replace(" ", ""))
            else:
                r, h = s["ref"].split(), s["hyp"].split()
            ops = align_tokens(r, h)
            ref_row, op_row, hyp_row = [], [], []
            for op, rt, ht in ops:
                rt = "<eps>" if rt is None else str(rt)
                ht = "<eps>" if ht is None else str(ht)
                w = max(len(rt), len(ht), len(op))
                ref_row.append(rt.center(w))
                op_row.append(op.center(w))
                hyp_row.append(ht.center(w))
            f.write(
                f"{s['id']}, %WER "
                f"{100.0 * s['err'] / max(s['num_ref'], 1):.2f} "
                f"[ {s['err']} / {s['num_ref']}, {s['ins']} ins, "
                f"{s['del']} del, {s['sub']} sub ]\n"
            )
            f.write(" ; ".join(ref_row) + "\n")
            f.write(" ; ".join(op_row) + "\n")
            f.write(" ; ".join(hyp_row) + "\n")


@dataclasses.dataclass
class AccuracyStats:
    """Token accuracy of argmax(p_seq) vs targets over valid positions."""

    correct: float = 0.0
    total: float = 0.0

    def append(
        self,
        log_probs: np.ndarray,  # (B, S, V)
        targets: np.ndarray,    # (B, S)
        lengths: Optional[np.ndarray] = None,  # (B,)
        weight: Optional[np.ndarray] = None,   # (B,) 0/1 row mask
    ) -> None:
        pred = log_probs.argmax(-1)
        b, s = targets.shape
        valid = (
            np.arange(s)[None, :] < lengths[:, None]
            if lengths is not None
            else np.ones((b, s), bool)
        )
        if weight is not None:
            valid = valid & (weight[:, None] > 0)
        self.correct += float(((pred == targets) & valid).sum())
        self.total += float(valid.sum())

    def summarize(self) -> float:
        return self.correct / max(self.total, 1.0)
