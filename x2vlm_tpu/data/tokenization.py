"""Tokenizer construction + fixed-shape text preprocessing.

Reference: dataset/tokenizers/__init__.py:5-25 (build_tokenizer picks
BERT/RoBERTa/XLM-R by path substring and aliases bos/eos to cls/sep) and the
per-dataset ``preprocess`` (dataset/pretrain_dataset.py:242-275): CLS + tokens
truncated to max_tokens, pad to fixed length — TPU-friendly static shapes, the
same contract the reference already uses.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

from x2vlm_tpu.data.masking import IGNORE_INDEX, TextMaskingGenerator, pad_masks

__all__ = ["build_tokenizer", "TextPreprocessor", "pre_caption"]


def build_tokenizer(path: str):
    """Pick the tokenizer family by path substring (reference behavior); alias
    bos/eos to cls/sep so downstream code is family-agnostic."""
    from transformers import AutoTokenizer, BertTokenizerFast, XLMRobertaTokenizerFast

    lowered = path.lower()
    if "xlm-roberta" in lowered or "xlmr" in lowered:
        tok = XLMRobertaTokenizerFast.from_pretrained(path)
    elif "roberta" in lowered:
        from transformers import RobertaTokenizerFast

        tok = RobertaTokenizerFast.from_pretrained(path)
    elif "bert" in lowered:
        tok = BertTokenizerFast.from_pretrained(path)
    else:
        tok = AutoTokenizer.from_pretrained(path)
    if tok.bos_token is None:
        tok.bos_token = tok.cls_token
    if tok.eos_token is None:
        tok.eos_token = tok.sep_token
    return tok


def pre_caption(caption: str, max_words: int) -> str:
    """Caption normalization (reference dataset/utils.py pre_caption): strip
    punctuation runs, lowercase, collapse whitespace, cap word count."""
    caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
    caption = re.sub(r"\s{2,}", " ", caption)
    caption = caption.rstrip("\n").strip(" ")
    words = caption.split(" ")
    if len(words) > max_words:
        caption = " ".join(words[:max_words])
    return caption


class TextPreprocessor:
    """Caption → fixed-shape (text_ids, text_atts[, masked variants])."""

    def __init__(
        self,
        tokenizer,
        max_tokens: int,
        max_words: Optional[int] = None,
        max_masks: int = 0,
        mask_prob: float = 0.5,
        mask_whole_word: bool = True,
        skipgram_prb: float = 0.2,
        skipgram_size: int = 3,
        add_eos: bool = True,
        use_roberta: bool = False,
        pre_tokenized: bool = False,
        rng=None,
    ):
        self.tokenizer = tokenizer
        self.pre_tokenized = pre_tokenized  # reference `tokenized: true` knob
        self.max_tokens = max_tokens
        self.max_words = max_words or max_tokens
        self.max_masks = max_masks
        self.add_eos = add_eos
        self.cls_token = tokenizer.cls_token
        self.eos_token = tokenizer.sep_token if not use_roberta else tokenizer.eos_token
        self.pad_id = tokenizer.pad_token_id
        if max_masks > 0:
            self.mask_generator = TextMaskingGenerator(
                tokenizer, mask_prob, max_masks, skipgram_prb, skipgram_size,
                mask_whole_word, use_roberta=use_roberta, rng=rng)

    def tokenize(self, text: str) -> List[str]:
        if self.pre_tokenized:
            # data already WordPiece-tokenized (space-joined pieces)
            pieces = text.split() if isinstance(text, str) else list(text)
            tokens = [self.cls_token] + pieces[: self.max_tokens - 1]
            if self.add_eos:
                tokens = tokens[: self.max_tokens - 1] + [self.eos_token]
            return tokens
        text = pre_caption(text, self.max_words)
        tokens = [self.cls_token] + self.tokenizer.tokenize(text)[: self.max_tokens - 1]
        if self.add_eos:
            tokens = tokens[: self.max_tokens - 1] + [self.eos_token]
        return tokens

    def __call__(self, text: str, with_masking: bool = False):
        tokens = self.tokenize(text)
        n = len(tokens)
        ids = self.tokenizer.convert_tokens_to_ids(tokens)
        pad = self.max_tokens - n
        text_ids = np.asarray(ids + [self.pad_id] * pad, np.int32)
        text_atts = np.asarray([1] * n + [0] * pad, np.int32)
        if not with_masking:
            return text_ids, text_atts
        masked_tokens, masked_pos = self.mask_generator(list(tokens))
        masked_ids_list = [ids[p] for p in masked_pos]
        ids_masked = self.tokenizer.convert_tokens_to_ids(masked_tokens)
        text_ids_masked = np.asarray(ids_masked + [self.pad_id] * pad, np.int32)
        pos, labels = pad_masks(masked_pos, masked_ids_list, self.max_masks)
        return (text_ids, text_atts, text_ids_masked,
                np.asarray(pos, np.int32), np.asarray(labels, np.int32))
