"""``sentencepiece`` shim for the north-star reference run.

SpeechBrain's tokenizer wrapper
(``vendor/speechbrain/speechbrain/tokenizers/SentencePiece.py``) drives
the Google SentencePiece C++ library through three entry points:
``SentencePieceTrainer.train(query)``, ``SentencePieceProcessor.load``,
and the processor's ``encode_as_ids`` / ``decode_ids`` / ``vocab_size``.
This shim backs them with this repo's native tokenizers
(``tsasr_tpu/data/tokenizer.py``), which implement the same
SentencePiece conventions (word-boundary marker, <unk> id) from scratch
— so both frameworks in the cross-framework comparison tokenize
identically, removing tokenizer variance from the WER comparison.

Only the surface the reference recipe reaches is implemented
(char/bpe/unigram training from a ``--input`` text file).
"""

import sys

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from tsasr_tpu.data.tokenizer import (  # noqa: E402
    BpeTokenizer,
    CharTokenizer,
    UnigramTokenizer,
    load_tokenizer,
)


def _train(texts, model_type, vocab_size, character_coverage, unk_id):
    if model_type == "char":
        return CharTokenizer.train(
            texts, vocab_size=vocab_size, unk_id=unk_id,
            character_coverage=character_coverage)
    if model_type == "bpe":
        return BpeTokenizer.train(texts, vocab_size=vocab_size,
                                  unk_id=unk_id)
    if model_type == "unigram":
        return UnigramTokenizer.train(texts, vocab_size=vocab_size,
                                      unk_id=unk_id)
    raise ValueError(f"Unknown model_type: {model_type!r}")


def _parse_query(query):
    opts = {}
    for part in query.split("--"):
        part = part.strip()
        if not part:
            continue
        key, _, value = part.partition("=")
        opts[key.strip()] = value.strip()
    return opts


class SentencePieceTrainer:
    @staticmethod
    def train(query):
        opts = _parse_query(query)
        with open(opts["input"], encoding="utf-8") as f:
            texts = [line.rstrip("\n") for line in f if line.strip()]
        model_type = opts.get("model_type", "char")
        vocab_size = int(opts["vocab_size"]) \
            if "vocab_size" in opts else None
        unk_id = int(opts.get("unk_id", 0))
        tok = _train(texts, model_type, vocab_size,
                     float(opts.get("character_coverage", 1.0)), unk_id)
        tok.save(opts["model_prefix"] + ".model")


class SentencePieceProcessor:
    def __init__(self):
        self._tok = None

    def load(self, path):
        self._tok = load_tokenizer(path)

    Load = load

    def encode_as_ids(self, text):
        return self._tok.encode_as_ids(text)

    def encode_as_pieces(self, text):
        return self._tok.encode_as_pieces(text)

    def decode_ids(self, ids):
        return self._tok.decode_ids(list(ids))

    def id_to_piece(self, i):
        return self._tok.pieces[i]

    def piece_to_id(self, piece):
        return self._tok.pieces.index(piece)

    def vocab_size(self):
        return self._tok.vocab_size()

    def get_piece_size(self):
        return self._tok.vocab_size()
