"""WordPiece tokenizer for the MiniLM encoder (host-side).

From-scratch implementation of BERT-style WordPiece (lowercase, greedy
longest-match-first with ``##`` continuations) — the tokenization the
reference gets implicitly through sentence-transformers. Loads a standard
``vocab.txt``; in zero-egress images with no vocab file a deterministic
hash-bucket fallback keeps the model runnable (ids = hash(token) into the
vocab range, skipping special ids).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import numpy as np

from .featurizer import fnv1a64

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"
_PUNCT_SPLIT = re.compile(r"(\W)")


class WordPieceTokenizer:
    def __init__(
        self,
        vocab: Optional[dict[str, int]] = None,
        vocab_size: int = 30522,
        max_len: int = 256,
        lowercase: bool = True,
    ):
        if vocab is not None and not vocab:
            raise ValueError("empty WordPiece vocab (unreadable vocab.txt?)")
        self.vocab = vocab
        self.vocab_size = vocab_size if vocab is None else max(vocab.values()) + 1
        self.max_len = max_len
        self.lowercase = lowercase
        if vocab is not None:
            self.pad_id = vocab.get(PAD, 0)
            self.unk_id = vocab.get(UNK, 100)
            self.cls_id = vocab.get(CLS, 101)
            self.sep_id = vocab.get(SEP, 102)
        else:
            self.pad_id, self.unk_id, self.cls_id, self.sep_id = 0, 100, 101, 102

    @classmethod
    def from_vocab_file(cls, path: str, **kwargs) -> "WordPieceTokenizer":
        vocab = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                # rstrip CR too: a CRLF vocab.txt would leave "\r" on every
                # token and silently map all text to [UNK].
                vocab[line.rstrip("\r\n")] = i
        return cls(vocab=vocab, **kwargs)

    @classmethod
    def find_checkpoint_vocab(cls, path: str, **kwargs) -> Optional["WordPieceTokenizer"]:
        vocab_path = os.path.join(path, "vocab.txt")
        if os.path.exists(vocab_path):
            return cls.from_vocab_file(vocab_path, **kwargs)
        return None

    # --- text → ids ------------------------------------------------------
    def _basic_tokens(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        out = []
        for piece in text.split():
            for frag in _PUNCT_SPLIT.split(piece):
                frag = frag.strip()
                if frag:
                    out.append(frag)
        return out

    def _wordpiece(self, token: str) -> list[int]:
        assert self.vocab is not None
        if token in self.vocab:
            return [self.vocab[token]]
        pieces = []
        start = 0
        while start < len(token):
            end = len(token)
            piece_id = None
            while end > start:
                sub = token[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece_id = self.vocab[sub]
                    break
                end -= 1
            if piece_id is None:
                return [self.unk_id]
            pieces.append(piece_id)
            start = end
        return pieces

    def _hash_ids(self, token: str) -> list[int]:
        # Deterministic fallback: hash into the non-special id range.
        # (Floor at 1: vocab_size <= 1000 would modulo by zero/negative and
        # emit invalid ids.)
        span = max(1, self.vocab_size - 1000)
        return [min(1000, self.vocab_size - 1) + fnv1a64(token.encode()) % span]

    def encode(self, text: str) -> list[int]:
        ids = [self.cls_id]
        for token in self._basic_tokens(text):
            ids.extend(self._wordpiece(token) if self.vocab is not None else self._hash_ids(token))
            if len(ids) >= self.max_len - 1:
                break
        ids = ids[: self.max_len - 1]
        ids.append(self.sep_id)
        return ids

    def encode_batch(
        self, texts: Sequence[str], pad_multiple: int = 16
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (input_ids [B, S], attention_mask [B, S]) padded to a
        static-friendly multiple."""
        encoded = [self.encode(t) for t in texts]
        longest = max((len(e) for e in encoded), default=1)
        seq = max(pad_multiple, -(-longest // pad_multiple) * pad_multiple)
        ids = np.full((len(texts), seq), self.pad_id, np.int32)
        mask = np.zeros((len(texts), seq), np.int32)
        for row, e in enumerate(encoded):
            ids[row, : len(e)] = e
            mask[row, : len(e)] = 1
        return ids, mask
