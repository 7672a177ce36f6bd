"""LibriSpeech data preparation: directory scan -> CSV manifests.

Reimplements the behavior of /root/reference/librispeech_prepare.py:
- `prepare_librispeech` (:146-265): per split, find audio + trans.txt,
  build `<split>.csv`, optionally merge splits into one train CSV.
- CSV schema `ID,duration,wav,spk_id,wrd` (:136).
- transcript parsing from `*trans.txt` (`text_to_dict`, :778-842).
- duration from the audio header (`process_line`, :503-565), done here
  without decoding (data/audio.py probes) and in a thread pool (the
  reference uses parallel_map with chunk 8192).
- skip logic (:698-775): if all CSVs exist with the same split config,
  preparation is skipped (config hash stored alongside).

Host-only; multi-process guards belong to the caller
(run on jax.process_index()==0, like the reference's run_on_main at
/root/reference/train_CTC.py:1080-1092).
"""

from __future__ import annotations

import csv
import json
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Sequence

from mamba_asr_tpu.data.audio import audio_duration

CSV_FIELDS = ["ID", "duration", "wav", "spk_id", "wrd"]
_OPT_FILE = "opt_librispeech_prepare.json"


@dataclass
class Utterance:
    utt_id: str
    duration: float
    path: str
    spk_id: str
    words: str


def _find_files(root: str, suffixes: Sequence[str]) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if any(f.endswith(s) for s in suffixes):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def text_to_dict(trans_files: Iterable[str]) -> Dict[str, str]:
    """Parse `<utt-id> TRANSCRIPT` lines from *trans.txt files."""
    text = {}
    for tf in trans_files:
        with open(tf, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                utt_id, _, words = line.partition(" ")
                text[utt_id] = words.strip().upper()
    return text


def create_csv(
    save_csv: str, audio_files: Sequence[str], text: Dict[str, str]
) -> None:
    """Write the manifest CSV for one split (schema as the reference)."""

    def row(path):
        utt_id = os.path.splitext(os.path.basename(path))[0]
        if utt_id not in text:
            return None
        spk_id = "-".join(utt_id.split("-")[0:2])
        return Utterance(utt_id, audio_duration(path), path, spk_id, text[utt_id])

    with ThreadPoolExecutor(max_workers=16) as pool:
        rows = [r for r in pool.map(row, audio_files) if r is not None]

    os.makedirs(os.path.dirname(save_csv) or ".", exist_ok=True)
    with open(save_csv, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(CSV_FIELDS)
        for r in rows:
            w.writerow([r.utt_id, f"{r.duration:.5f}", r.path, r.spk_id, r.words])


def merge_csvs(save_folder: str, csv_names: Sequence[str], merged_name: str) -> None:
    out_path = os.path.join(save_folder, merged_name)
    with open(out_path, "w", newline="", encoding="utf-8") as out:
        w = csv.writer(out)
        w.writerow(CSV_FIELDS)
        for name in csv_names:
            with open(os.path.join(save_folder, name), encoding="utf-8") as f:
                r = csv.reader(f)
                next(r)  # header
                for row in r:
                    w.writerow(row)


def _skip(save_folder: str, splits: Sequence[str], merge_name: Optional[str],
          conf: dict) -> bool:
    for split in splits:
        if not os.path.isfile(os.path.join(save_folder, split + ".csv")):
            return False
    if merge_name and not os.path.isfile(os.path.join(save_folder, merge_name)):
        return False
    opt_path = os.path.join(save_folder, _OPT_FILE)
    if not os.path.isfile(opt_path):
        return False
    with open(opt_path, encoding="utf-8") as f:
        return json.load(f) == conf


def prepare_librispeech(
    data_folder: str,
    save_folder: str,
    tr_splits: Sequence[str] = (),
    dev_splits: Sequence[str] = (),
    te_splits: Sequence[str] = (),
    merge_lst: Sequence[str] = (),
    merge_name: Optional[str] = None,
    skip_prep: bool = False,
) -> None:
    """Scan LibriSpeech split dirs and write CSV manifests.

    Mirrors the reference entry point's signature and behavior
    (librispeech_prepare.py:146-265). Accepts .flac (LibriSpeech native)
    and .wav (converted corpora / synthetic data).
    """
    if skip_prep:
        return
    splits = list(tr_splits) + list(dev_splits) + list(te_splits)
    conf = {"splits": splits, "merge": list(merge_lst), "merge_name": merge_name}
    os.makedirs(save_folder, exist_ok=True)
    if _skip(save_folder, splits, merge_name, conf):
        return

    for split in splits:
        split_dir = os.path.join(data_folder, split)
        if not os.path.isdir(split_dir):
            raise FileNotFoundError(
                f"split directory not found: {split_dir} "
                "(expected LibriSpeech layout <data_folder>/<split>/...)"
            )
        audio_files = _find_files(split_dir, (".flac", ".wav"))
        trans_files = _find_files(split_dir, ("trans.txt",))
        text = text_to_dict(trans_files)
        create_csv(os.path.join(save_folder, split + ".csv"), audio_files, text)

    if merge_lst and merge_name:
        merge_csvs(save_folder, [s + ".csv" for s in merge_lst], merge_name)

    with open(os.path.join(save_folder, _OPT_FILE), "w", encoding="utf-8") as f:
        json.dump(conf, f)


def create_lexicon(
    save_folder: str,
    csv_names: Sequence[str],
    lexicon_name: str = "lexicon.csv",
) -> str:
    """Grapheme lexicon from the manifest vocabulary.

    The reference optionally builds lexicon CSVs mapping each word to its
    character sequence for G2P-style training
    (librispeech_prepare.py:268-457); same artifact here (columns
    ID,duration,char,wrd with duration 0 as in the reference's lexicon
    rows is overkill — we emit the functional mapping word,chars).
    """
    words = set()
    for name in csv_names:
        for utt in load_manifest(os.path.join(save_folder, name)):
            words.update(utt.words.split())
    out_path = os.path.join(save_folder, lexicon_name)
    with open(out_path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["word", "chars"])
        for word in sorted(words):
            w.writerow([word, " ".join(word)])
    return out_path


_LEXICON_HEADER = "ID,duration,char,phn\n"


def create_pronunciation_lexicon(
    save_folder: str,
    lexicon_txt: str,
    split_ratio: Sequence[int] = (98, 1, 1),
    seed: int = 1234,
) -> str:
    """Pronunciation-lexicon CSVs for G2P training from a local
    `librispeech-lexicon.txt` (the official dictionary: one
    `WORD P H O N E M E S` entry per line).

    Offline port of the reference's `create_lexicon_and_oov_csv` +
    `split_lexicon` (librispeech_prepare.py:268-457): stress digits are
    stripped from phonemes, each word becomes a row
    `ID,duration,char,phn` with duration = grapheme count, and the
    result is shuffled and split 98/1/1 into `lexicon_tr/dev/test.csv`
    (header preserved in every file; the test split takes the
    remainder, matching the reference's slicing). The download half of
    the reference function is environment-blocked here (zero egress),
    so the dictionary file must already exist on disk — point
    `lexicon_txt` at it.

    Deviation: the reference's shuffle is unseeded (`random.shuffle`);
    we seed it so splits are reproducible across runs.
    """
    rows = []
    with open(lexicon_txt, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            word, phones = parts[0], parts[1:]
            graphemes = " ".join(word)
            phonemes = " ".join(p.strip("0123456789") for p in phones)
            rows.append((len(word), graphemes, phonemes))

    lexicon_csv = os.path.join(save_folder, "lexicon.csv")
    with open(lexicon_csv, "w", encoding="utf-8") as f:
        f.write(_LEXICON_HEADER)
        for idx, (dur, graphemes, phonemes) in enumerate(rows):
            f.write(f"{idx},{dur},{graphemes},{phonemes}\n")

    split_lexicon(save_folder, split_ratio, seed=seed)
    return lexicon_csv


def split_lexicon(
    data_folder: str,
    split_ratio: Sequence[int] = (98, 1, 1),
    seed: int = 1234,
) -> None:
    """Shuffle `lexicon.csv` and write `lexicon_tr/dev/test.csv`
    (reference `split_lexicon`, librispeech_prepare.py:380-457: header
    kept in every split; train/valid sizes are floor(ratio% * n), test
    takes the remainder)."""
    import random

    with open(os.path.join(data_folder, "lexicon.csv"), encoding="utf-8") as f:
        lines = f.readlines()[1:]
    random.Random(seed).shuffle(lines)
    n_tr = int(0.01 * split_ratio[0] * len(lines))
    n_dev = int(0.01 * split_ratio[1] * len(lines))
    parts = {
        "lexicon_tr.csv": lines[:n_tr],
        "lexicon_dev.csv": lines[n_tr : n_tr + n_dev],
        "lexicon_test.csv": lines[n_tr + n_dev :],
    }
    for name, body in parts.items():
        with open(os.path.join(data_folder, name), "w", encoding="utf-8") as f:
            f.writelines([_LEXICON_HEADER] + body)


def load_manifest(csv_path: str) -> List[Utterance]:
    out = []
    with open(csv_path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            out.append(
                Utterance(
                    row["ID"], float(row["duration"]), row["wav"],
                    row["spk_id"], row["wrd"],
                )
            )
    return out
