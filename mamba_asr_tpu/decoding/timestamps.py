"""Word-level timestamps from greedy CTC alignments.

The reference exposes no time-alignment surface (its
`ctc_greedy_decode` returns bare ids, /root/reference/train_CTC.py:306);
this module turns the per-token frame spans from
`ctc_greedy_decode_with_times` into `(word, start_s, end_s)` triples —
the surface a serving user actually wants (captioning, diarization
alignment, keyword spotting).

Word grouping is tokenizer-agnostic: tokens are attributed to words by
incremental decoding (decode(ids[:i+1]) minus decode(ids[:i])), which
handles both the char-31 tokenizer (explicit space tokens) and BPE
pieces (implicit word starts) without peeking at tokenizer internals.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple


def encoder_frame_seconds(frontend_cfg, model_cfg) -> float:
    """Duration of one ENCODER output frame in seconds: the fbank hop
    times the conv frontend's total time downsampling."""
    ds = 1
    for s in model_cfg.frontend_strides:
        ds *= int(s)
    return frontend_cfg.hop / float(frontend_cfg.sample_rate) * ds


def token_texts(ids: Sequence[int], tokenizer) -> List[str]:
    """Per-token text contributions via incremental decode.

    Falls back to one-token decodes if the tokenizer's decode is not
    prefix-monotone (decode(ids[:i+1]) does not extend decode(ids[:i]))."""
    texts: List[str] = []
    prev = ""
    ok = True
    for i in range(len(ids)):
        cur = tokenizer.decode(list(ids[: i + 1]))
        if not cur.startswith(prev):
            ok = False
            break
        texts.append(cur[len(prev):])
        prev = cur
    if ok:
        return texts
    return [tokenizer.decode([int(t)]) for t in ids]


def word_timestamps(
    ids: Sequence[int],
    onsets: Sequence[int],
    offsets: Sequence[int],
    tokenizer,
    frame_seconds: float,
    confs: Optional[Sequence[float]] = None,
) -> List[Tuple]:
    """Greedy-aligned word times (and optional confidences).

    ids/onsets/offsets: one utterance's packed tokens + frame spans
    (from ctc_greedy_decode_with_times, already truncated to length).
    Returns [(word, start_s, end_s)] with start = onset of the word's
    first contributing token, end = end of its last token's run
    (inclusive frame + 1, i.e. the frame boundary). With `confs`
    (per-token confidences from the same decode) each entry becomes
    (word, start_s, end_s, conf) where conf = min over the word's
    contributing tokens — the conservative word confidence.
    """
    ids = [int(t) for t in ids]
    texts = token_texts(ids, tokenizer)
    words: List[list] = []
    cur_word = ""
    cur_start = cur_end = None
    cur_conf = 1.0
    for tok_i, text in enumerate(texts):
        for ch in text:
            if ch.isspace():
                if cur_word:
                    words.append([cur_word, cur_start, cur_end, cur_conf])
                cur_word, cur_start, cur_end = "", None, None
                cur_conf = 1.0
            else:
                if not cur_word:
                    cur_start = float(onsets[tok_i]) * frame_seconds
                cur_word += ch
                cur_end = (float(offsets[tok_i]) + 1.0) * frame_seconds
                if confs is not None:
                    cur_conf = min(cur_conf, float(confs[tok_i]))
    if cur_word:
        words.append([cur_word, cur_start, cur_end, cur_conf])
    out = []
    for w, s, e, c in words:
        if s is None or math.isnan(s):
            continue
        if confs is not None:
            out.append((w, round(s, 3), round(e, 3), round(c, 4)))
        else:
            out.append((w, round(s, 3), round(e, 3)))
    return out
