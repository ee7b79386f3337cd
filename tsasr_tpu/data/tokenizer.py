"""Tokenizers: native char-level tokenizer + optional SentencePiece gate.

The reference wraps the SentencePiece C++ library
(``vendor/speechbrain/speechbrain/tokenizers/SentencePiece.py:20-465``)
with the recipe default ``token_type=char`` and ``vocab_size=29``
(``hparams/LibriSpeechMix/conformer-t_scratch.yaml:76-79``). SentencePiece
is not available in this environment, so the critical char path is a
native implementation with SentencePiece-compatible conventions:

- text is pre-tokenized by replacing spaces with the word-boundary marker
  "▁" and prepending one at the start of the sentence;
- the piece inventory is ``<unk>`` at ``unk_id`` plus all characters
  sorted by descending frequency (ties by codepoint), like a char model;
- ``decode`` joins pieces and turns word-boundary markers back into
  spaces.

``train_tokenizer`` dispatches to SentencePiece for bpe/unigram when the
library exists and raises a clear error otherwise.
"""

import json
import os
from collections import Counter

WORD_BOUNDARY = "▁"


class CharTokenizer:
    """Char-level tokenizer with SentencePiece char-model conventions."""

    def __init__(self, pieces, unk_id=0):
        self.pieces = list(pieces)
        self.unk_id = unk_id
        self._piece_to_id = {p: i for i, p in enumerate(self.pieces)}
        if self.pieces[unk_id] != "<unk>":
            raise ValueError("pieces[unk_id] must be '<unk>'")

    # ------------------------------------------------------------ factory
    @classmethod
    def train(cls, texts, vocab_size=None, unk_id=0, character_coverage=1.0):
        """Build the inventory from an iterable of training sentences."""
        counter = Counter()
        for text in texts:
            counter.update(_pretokenize(text))
        # coverage: drop the rarest chars until the kept mass >= coverage
        items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
        if character_coverage < 1.0:
            total = sum(counter.values())
            kept, mass = [], 0
            for ch, cnt in items:
                if mass / total >= character_coverage:
                    break
                kept.append((ch, cnt))
                mass += cnt
            items = kept
        chars = [ch for ch, _ in items]
        if vocab_size is not None:
            if len(chars) + 1 > vocab_size:
                chars = chars[: vocab_size - 1]
            elif len(chars) + 1 < vocab_size:
                raise ValueError(
                    f"vocab_size={vocab_size} but only {len(chars) + 1} "
                    f"pieces found; with token_type=char, vocab_size must "
                    f"equal the number of found characters + 1")
        pieces = chars[:unk_id] + ["<unk>"] + chars[unk_id:]
        return cls(pieces, unk_id=unk_id)

    @classmethod
    def load(cls, path):
        with open(path, encoding="utf-8") as f:
            obj = json.load(f)
        return cls(obj["pieces"], unk_id=obj["unk_id"])

    def save(self, path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"pieces": self.pieces, "unk_id": self.unk_id}, f,
                      ensure_ascii=False, indent=2)

    # ------------------------------------------------------------- encode
    @property
    def vocab_size(self):
        return len(self.pieces)

    def encode_as_ids(self, text):
        return [self._piece_to_id.get(ch, self.unk_id)
                for ch in _pretokenize(text)]

    def encode_as_pieces(self, text):
        return list(_pretokenize(text))

    def decode_ids(self, ids):
        text = "".join(self.pieces[i] for i in ids
                       if 0 <= i < len(self.pieces) and i != self.unk_id)
        return text.replace(WORD_BOUNDARY, " ").strip()

    def decode_ids_to_words(self, ids):
        """Token ids -> list of words (the recipe's decode_from_list)."""
        decoded = self.decode_ids(ids)
        return decoded.split(" ") if decoded else [""]

    def __call__(self, batch_ids, task="decode_from_list"):
        """Batch interface mirroring the reference SentencePiece wrapper."""
        if task == "decode_from_list":
            return [self.decode_ids_to_words(ids) for ids in batch_ids]
        if task == "encode":
            return [self.encode_as_ids(text) for text in batch_ids]
        raise ValueError(f"Unknown task: {task}")


def _pretokenize(text):
    """SentencePiece-style pre-tokenization for char models."""
    text = " ".join(text.split())  # normalize whitespace
    return WORD_BOUNDARY + text.replace(" ", WORD_BOUNDARY)


def train_tokenizer(model_dir, texts, vocab_size, model_type="char",
                    character_coverage=1.0, unk_id=0):
    """Train or load a tokenizer; mirrors the reference wrapper's
    train-on-main/load-elsewhere contract (SentencePiece.py:279-393).

    char -> native ``CharTokenizer``. bpe/unigram -> the SentencePiece
    library if importable (not bundled in this image).
    """
    if model_type == "char":
        path = os.path.join(model_dir, f"char_{vocab_size}.json")
        if os.path.exists(path):
            return CharTokenizer.load(path)
        tok = CharTokenizer.train(texts, vocab_size=vocab_size,
                                  unk_id=unk_id,
                                  character_coverage=character_coverage)
        tok.save(path)
        return tok
    try:
        import sentencepiece  # noqa: F401
    except ImportError as e:
        raise ImportError(
            f"token_type={model_type} requires the sentencepiece library, "
            f"which is not available; use token_type=char") from e
    raise NotImplementedError(
        "SentencePiece bpe/unigram wrapper pending library availability")
