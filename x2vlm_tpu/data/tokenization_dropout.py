"""WordPiece-dropout tokenization (reference
dataset/tokenizers/bert_tokenizer_with_dropout.py:4-119): during training,
greedy longest-match WordPiece occasionally stops early, yielding alternative
segmentations — a subword-regularization effect for noisy web text."""

from __future__ import annotations

import random
from typing import List, Optional

__all__ = ["WordpieceTokenizerWithDropout"]


class WordpieceTokenizerWithDropout:
    """Wraps an HF Bert tokenizer's vocab with dropout-in-longest-match.

    With probability `dropout` at each longest-match step, the matcher accepts
    a shorter prefix instead of the longest one (never the empty match)."""

    def __init__(self, tokenizer, dropout: float = 0.1,
                 rng: Optional[random.Random] = None,
                 max_input_chars_per_word: int = 100):
        self.vocab = tokenizer.get_vocab()
        self.unk_token = tokenizer.unk_token
        self.basic = tokenizer
        self.dropout = dropout
        self.rng = rng or random.Random()
        self.max_chars = max_input_chars_per_word

    def _wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars:
            return [self.unk_token]
        out: List[str] = []
        start = 0
        while start < len(word):
            # collect all matching prefixes (longest first)
            matches = []
            end = len(word)
            while end > start:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    matches.append((end, sub))
                end -= 1
            if not matches:
                return [self.unk_token]
            pick = 0
            while (pick < len(matches) - 1 and self.dropout > 0
                   and self.rng.random() < self.dropout):
                pick += 1
            end, sub = matches[pick]
            out.append(sub)
            start = end
        return out

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        # reuse the HF basic (pre-)tokenization, then re-wordpiece with dropout
        words = self.basic.basic_tokenizer.tokenize(text) if hasattr(
            self.basic, "basic_tokenizer") else text.lower().split()
        for w in words:
            out.extend(self._wordpiece(w))
        return out

    def __getattr__(self, name):
        return getattr(self.basic, name)
