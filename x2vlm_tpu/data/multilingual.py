"""Multilingual pretraining streams (reference
dataset/pretrain_dataset_multilingual.py, 669 LoC — CCLM data zoo):

- ``ImageMultiTextStream``: captions keyed by language code; a random
  available language is drawn per sample (reference :174-203)
- ``RegionMultiTextStream``: region stream + optional ``code_switch`` (mix
  languages across regions of one image; reference :288,394)
- ``ParaTextStream``: parallel text pairs with random direction swap and
  optional TLM concatenation (reference :500-668)
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from x2vlm_tpu.data.pretrain import ImageTextStream, RegionTextStream, _StreamBase

__all__ = ["ImageMultiTextStream", "RegionMultiTextStream", "ParaTextStream",
           "choose_language"]


def choose_language(caption_dict: Dict[str, str], languages: Sequence[str],
                    rng) -> str:
    avail = [l for l in languages if l in caption_dict and caption_dict[l]]
    if not avail:
        raise ValueError("no caption in requested languages")
    return caption_dict[rng.choice(avail)]


class ImageMultiTextStream(ImageTextStream):
    def __init__(self, reader, text_pre, transform, languages: Sequence[str],
                 image_key="binary", caption_key="caption",
                 is_image_rpath=False, rng=None):
        super().__init__(reader, text_pre, transform, image_key=image_key,
                         caption_key=caption_key, is_image_rpath=is_image_rpath,
                         rng=rng)
        self.languages = list(languages)

    def _text_sample(self, ann: dict, image: np.ndarray) -> Dict:
        # only the caption choice differs from the monolingual stream — keep
        # the parent's image handling (uint8 transport, native decode path)
        caption = choose_language(ann[self.caption_key], self.languages,
                                  self.rng)
        ids, atts, ids_m, pos, labels = self.text_pre(
            caption, with_masking=True)
        return {"image": image, "text_ids": ids, "text_atts": atts,
                "text_ids_masked": ids_m, "masked_pos": pos,
                "masked_ids": labels}


class RegionMultiTextStream(RegionTextStream):
    def __init__(self, *args, languages: Sequence[str] = ("en",),
                 code_switch: bool = True, **kw):
        super().__init__(*args, **kw)
        self.languages = list(languages)
        self.code_switch = code_switch
        self._fixed_language: Optional[str] = None

    def _one(self, ann):
        # per-image language unless code_switch (then per-region via
        # choose_language inside _choose_caption override)
        if not self.code_switch:
            avail = None
            for e in ann.get("elems", []):
                if isinstance(e.get("caption"), dict):
                    langs = [l for l in self.languages if l in e["caption"]]
                    avail = langs if avail is None else [l for l in avail if l in langs]
            self._fixed_language = self.rng.choice(avail) if avail else None
        else:
            self._fixed_language = None
        try:
            return super()._one(self._localized(ann))
        finally:
            self._fixed_language = None

    def _localized(self, ann):
        def localize(caption):
            if isinstance(caption, dict):
                if self._fixed_language and caption.get(self._fixed_language):
                    return caption[self._fixed_language]
                return choose_language(caption, self.languages, self.rng)
            return caption

        out = dict(ann)
        if isinstance(out.get("caption"), dict):
            out["caption"] = localize(out["caption"])
        out["elems"] = [dict(e, caption=localize(e["caption"]))
                        for e in ann["elems"]]
        return out


class ParaTextStream(_StreamBase):
    """{(text|text1), text2} pairs → TTC/TTM/TLM sample with random direction
    swap (reference ParaTextDataset:500-668)."""

    def __init__(self, reader, text_pre, key_a: str = "text1",
                 key_b: str = "text2", swap_prob: float = 0.5, rng=None):
        super().__init__(reader, text_pre, rng)
        self.key_a = key_a
        self.key_b = key_b
        self.swap_prob = swap_prob

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for ann in self.reader.iter_json():
            try:
                a = ann.get(self.key_a, ann.get("text"))
                b = ann[self.key_b]
                if self.rng.random() < self.swap_prob:
                    a, b = b, a
                ids, atts, ids_m, pos, labels = self.text_pre(
                    a, with_masking=True)
                ids2, atts2 = self.text_pre(b)
                yield {"text_ids": ids, "text_atts": atts,
                       "text_ids_masked": ids_m, "masked_pos": pos,
                       "masked_ids": labels,
                       "text_ids_2": ids2, "text_atts_2": atts2}
            except Exception:
                self.broken += 1
