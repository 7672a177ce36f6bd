"""Tokenizers: native char model (CTC) + trained subword models (S2S).

Replaces the reference's C++ SentencePiece dependency
(/root/reference/train_CTC.py:112,1100-1109 trains a 31-piece char model
on train.csv; the S2S configs load a pretrained 5000-unigram model).
Token-id conventions follow the reference configs
(/root/reference/hparams/CTC/conmamba_large.yaml:164-167):
pad == blank == 0, bos == 1, eos == 2.

- `CharTokenizer`: dependency-free character model fitted on the corpus
  (the reference's char-31 CTC vocab: A-Z, apostrophe, space + specials).
- `SubwordTokenizer`: BPE/unigram via the HuggingFace `tokenizers`
  library when available (vocab 5000 for the S2S recipes).

Both serialize to a single JSON file.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Sequence

PAD_ID = 0   # also the CTC blank
BOS_ID = 1
EOS_ID = 2
UNK_ID = 3
_SPECIALS = ["<pad>", "<bos>", "<eos>", "<unk>"]


class CharTokenizer:
    """Character tokenizer with reference-compatible special ids."""

    def __init__(self, chars: Sequence[str]):
        self.chars = list(chars)
        self.id_to_tok = _SPECIALS + self.chars
        self.tok_to_id = {t: i for i, t in enumerate(self.id_to_tok)}

    @classmethod
    def fit(cls, corpus: Iterable[str], vocab_size: Optional[int] = None
            ) -> "CharTokenizer":
        """Collect the character set from text (most frequent first)."""
        freq = {}
        for line in corpus:
            for ch in line:
                freq[ch] = freq.get(ch, 0) + 1
        chars = sorted(freq, key=lambda c: (-freq[c], c))
        if vocab_size is not None:
            chars = chars[: vocab_size - len(_SPECIALS)]
        return cls(sorted(chars))

    @property
    def vocab_size(self) -> int:
        return len(self.id_to_tok)

    def encode(self, text: str) -> List[int]:
        return [self.tok_to_id.get(ch, UNK_ID) for ch in text]

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(
            self.id_to_tok[i]
            for i in ids
            if i >= len(_SPECIALS) and i < len(self.id_to_tok)
        )

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"type": "char", "chars": self.chars}, f)

    @classmethod
    def load(cls, path: str) -> "CharTokenizer":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        assert d["type"] == "char"
        return cls(d["chars"])


class SubwordTokenizer:
    """BPE/unigram subword model via HuggingFace `tokenizers`.

    The reference's 5000-piece unigram model
    (/root/reference/hparams/S2S/conmamba_large.yaml:300) equivalent.
    Ids are remapped so pad/bos/eos/unk occupy 0-3.
    """

    def __init__(self, tok):
        self._tok = tok

    @classmethod
    def train(
        cls,
        corpus: Iterable[str],
        vocab_size: int = 5000,
        model_type: str = "bpe",
    ) -> "SubwordTokenizer":
        try:
            import tokenizers
            from tokenizers import Tokenizer, models, pre_tokenizers, trainers
        except ImportError as e:
            raise RuntimeError(
                "SubwordTokenizer requires the `tokenizers` package; "
                "use CharTokenizer instead"
            ) from e
        if model_type == "bpe":
            tok = Tokenizer(models.BPE(unk_token="<unk>"))
            trainer = trainers.BpeTrainer(
                vocab_size=vocab_size, special_tokens=_SPECIALS
            )
        elif model_type == "unigram":
            tok = Tokenizer(models.Unigram())
            trainer = trainers.UnigramTrainer(
                vocab_size=vocab_size, special_tokens=_SPECIALS,
                unk_token="<unk>",
            )
        else:
            raise ValueError(model_type)
        tok.pre_tokenizer = pre_tokenizers.Metaspace()
        tok.decoder = tokenizers.decoders.Metaspace()
        tok.train_from_iterator(corpus, trainer)
        return cls(tok)

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(
            [i for i in ids if i >= len(_SPECIALS)]
        ).strip()

    def save(self, path: str) -> None:
        self._tok.save(path)

    @classmethod
    def load(cls, path: str) -> "SubwordTokenizer":
        from tokenizers import Tokenizer

        return cls(Tokenizer.from_file(path))


def load_tokenizer(path: str):
    """Load either tokenizer type from its JSON file."""
    with open(path, encoding="utf-8") as f:
        head = f.read(4096)
    if '"type": "char"' in head:
        return CharTokenizer.load(path)
    return SubwordTokenizer.load(path)
