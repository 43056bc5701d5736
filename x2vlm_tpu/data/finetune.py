"""Fine-tune datasets: VQA, NLVR2, grounding, captioning, video QA.

References: dataset/vqa_dataset.py (answer-weight aggregation, careful hflip,
video frames), dataset/nlvr_dataset.py, dataset/grounding_dataset.py:89-147
(bbox-preserving crop + coordinate renormalization), and
dataset/captioning_dataset.py:99-202 (UniLM masking, standard + FG-free).

TPU batch contract: every sample/batch has static shapes. Ragged answer lists
(k answers per question) are flattened to a fixed ``answers_per_batch`` row
count with zero-weight padding rows — weight-0 rows contribute nothing to the
loss, preserving the reference's ragged-concat semantics (VQA.py,
vqa_collate_fn at dataset/__init__.py:483-492) with one compiled shape.
"""

from __future__ import annotations

import json
import math
import os
import random
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from x2vlm_tpu.data.imageio import open_image

from x2vlm_tpu.data.loader import collate
from x2vlm_tpu.data.masking import TextMaskingGenerator
from x2vlm_tpu.data.retrieval import _load_annotations
from x2vlm_tpu.data.tokenization import TextPreprocessor, pre_caption
from x2vlm_tpu.data.transforms import hflip, normalize

__all__ = [
    "VQATrainDataset", "VQAEvalDataset", "vqa_collate", "tokenize_answers",
    "NLVRDataset", "GroundingTrainDataset", "GroundingEvalDataset",
    "CaptioningTrainDataset", "CaptioningEvalDataset",
]


def tokenize_answers(answers: Sequence[str], tokenizer, max_tokens: int):
    """Answer list → (A, L) ids/atts with CLS prefix and SEP/EOS suffix
    (rank-answer protocol; reference VQA.py:78)."""
    ids, atts = [], []
    for a in answers:
        toks = [tokenizer.cls_token] + tokenizer.tokenize(a)
        toks = toks[: max_tokens - 1] + [tokenizer.sep_token]
        ii = tokenizer.convert_tokens_to_ids(toks)
        pad = max_tokens - len(ii)
        ids.append(ii + [tokenizer.pad_token_id] * pad)
        atts.append([1] * len(ii) + [0] * pad)
    return np.asarray(ids, np.int32), np.asarray(atts, np.int32)


class VQATrainDataset:
    """ann: {image, question, answer: [..], (weight|dataset)}; VQA answers get
    weight count/10 when given 10 human answers (reference vqa_dataset.py:92-156)."""

    def __init__(self, ann_files, transform, image_roots: Dict[str, str] | str,
                 text_pre: TextPreprocessor, tokenizer, answer_max_tokens: int = 10,
                 rng: Optional[random.Random] = None):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.image_roots = image_roots
        self.text_pre = text_pre
        self.tokenizer = tokenizer
        self.answer_max_tokens = answer_max_tokens
        self.rng = rng or random

    def __len__(self):
        return len(self.ann)

    def _image_path(self, a):
        if isinstance(self.image_roots, str):
            return os.path.join(self.image_roots, a["image"])
        return os.path.join(self.image_roots[a.get("dataset", "vqa")], a["image"])

    def __getitem__(self, index):
        a = self.ann[index]
        img = open_image(self._image_path(a))
        image = self.transform(img).astype(np.float32)
        q_ids, q_atts = self.text_pre(a["question"])
        answers = a["answer"] if isinstance(a["answer"], list) else [a["answer"]]
        if "weight" in a:
            weights = list(a["weight"])
        else:
            # aggregate duplicates: weight = count / len
            uniq: Dict[str, float] = {}
            for ans in answers:
                uniq[ans] = uniq.get(ans, 0.0) + 1.0 / len(answers)
            answers, weights = list(uniq.keys()), list(uniq.values())
        ans_ids, ans_atts = tokenize_answers(answers, self.tokenizer,
                                             self.answer_max_tokens)
        return {"image": image, "question_ids": q_ids, "question_atts": q_atts,
                "answers": ans_ids, "answer_atts": ans_atts,
                "weights": np.asarray(weights, np.float32)}


def vqa_collate(samples: Sequence[Dict], answers_per_batch: int,
                rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
    """Fixed-shape VQA train batch: flatten per-question answers into
    `answers_per_batch` rows (truncate / zero-weight-pad). Truncation sampling
    takes the injected ``rng`` so runs are reproducible."""
    rng = rng or random.Random(0)
    base = collate([{k: s[k] for k in ("image", "question_ids", "question_atts")}
                    for s in samples])
    ans_ids, ans_atts, weights, index = [], [], [], []
    for qi, s in enumerate(samples):
        for j in range(s["answers"].shape[0]):
            ans_ids.append(s["answers"][j])
            ans_atts.append(s["answer_atts"][j])
            weights.append(s["weights"][j])
            index.append(qi)
    if len(ans_ids) > answers_per_batch:
        keep = sorted(rng.sample(range(len(ans_ids)), answers_per_batch))
        ans_ids = [ans_ids[i] for i in keep]
        ans_atts = [ans_atts[i] for i in keep]
        weights = [weights[i] for i in keep]
        index = [index[i] for i in keep]
    while len(ans_ids) < answers_per_batch:
        ans_ids.append(np.zeros_like(ans_ids[0]))
        ans_atts.append(np.zeros_like(ans_atts[0]))
        ans_atts[-1][0] = 1  # keep one valid key to avoid NaN rows
        weights.append(0.0)
        index.append(0)
    base["answer_ids"] = np.stack(ans_ids)
    base["answer_atts"] = np.stack(ans_atts)
    base["answer_weights"] = np.asarray(weights, np.float32)
    base["answer_index"] = np.asarray(index, np.int32)
    return base


class VQAEvalDataset:
    def __init__(self, ann_files, transform, image_roots, text_pre,
                 tokenizer, answer_list_file: Optional[str] = None,
                 answer_max_tokens: int = 10):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.image_roots = image_roots
        self.text_pre = text_pre
        if answer_list_file:
            with open(answer_list_file) as f:
                self.answer_list = json.load(f)
        else:
            self.answer_list = None
        if self.answer_list is not None:
            self.answer_ids, self.answer_atts = tokenize_answers(
                self.answer_list, tokenizer, answer_max_tokens)

    def __len__(self):
        return len(self.ann)

    def gt_answers(self) -> Dict[int, list]:
        """qid → human answer list, for test splits that carry answers
        (reference VQA.py:94-116 evaluates against the test annotation when
        available; test-std has none and only dumps results)."""
        out = {}
        for i, a in enumerate(self.ann):
            if "answer" in a:
                ans = a["answer"] if isinstance(a["answer"], list) else [a["answer"]]
                out[int(a.get("question_id", i))] = ans
        return out

    def _image_path(self, a):
        if isinstance(self.image_roots, str):
            return os.path.join(self.image_roots, a["image"])
        return os.path.join(self.image_roots[a.get("dataset", "vqa")], a["image"])

    def __getitem__(self, index):
        a = self.ann[index]
        img = open_image(self._image_path(a))
        image = self.transform(img).astype(np.float32)
        q_ids, q_atts = self.text_pre(a["question"])
        return {"image": image, "question_ids": q_ids, "question_atts": q_atts,
                "question_id": np.int64(a.get("question_id", index))}


class NLVRDataset:
    """ann: {images: [im0, im1], sentence, label: 'True'|'False'}
    (reference nlvr_dataset.py)."""

    def __init__(self, ann_files, transform, image_root, text_pre):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.image_root = image_root
        self.text_pre = text_pre

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        a = self.ann[index]
        im0 = open_image(a["images"][0], self.image_root)
        im1 = open_image(a["images"][1], self.image_root)
        ids, atts = self.text_pre(a["sentence"])
        label = 1 if str(a["label"]).lower() == "true" else 0
        return {"image0": self.transform(im0).astype(np.float32),
                "image1": self.transform(im1).astype(np.float32),
                "text_ids": ids, "text_atts": atts,
                "labels": np.int32(label)}


class GroundingTrainDataset:
    """RefCOCO-style: bbox-preserving random crop + hflip + renormalized
    cxcywh target (reference grounding_dataset.py:89-147)."""

    def __init__(self, ann_files, box_aug, image_root, text_pre,
                 image_res: int, careful_hflip: bool = True,
                 rng: Optional[random.Random] = None):
        self.ann = _load_annotations(ann_files)
        self.box_aug = box_aug  # augment-only transform (normalize included)
        self.image_root = image_root
        self.text_pre = text_pre
        self.image_res = image_res
        self.careful_hflip = careful_hflip
        self.rng = rng or random

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        rng = self.rng
        a = self.ann[index]
        img = open_image(a["image"], self.image_root)
        W, H = img.size
        x, y, w, h = a["bbox"]
        caption = a["text"]

        # random crop containing the box
        x0 = rng.randint(0, int(math.floor(x)))
        y0 = rng.randint(0, int(math.floor(y)))
        x1 = rng.randint(min(int(math.ceil(x + w)), W), W)
        y1 = rng.randint(min(int(math.ceil(y + h)), H), H)
        img = img.crop((x0, y0, x1, y1))
        W2, H2 = img.size
        x, y = x - x0, y - y0

        if rng.random() < 0.5 and not (
                self.careful_hflip and ("left" in caption or "right" in caption)):
            img = hflip(img)
            x = (W2 - x) - w

        sx = self.image_res / W2
        sy = self.image_res / H2
        x, w = x * sx, w * sx
        y, h = y * sy, h * sy
        img = img.resize((self.image_res, self.image_res), Image.BICUBIC)
        image = self.box_aug(img).astype(np.float32)
        ids, atts = self.text_pre(caption)
        target = np.asarray([(x + w / 2) / self.image_res,
                             (y + h / 2) / self.image_res,
                             w / self.image_res, h / self.image_res], np.float32)
        return {"image": image, "text_ids": ids, "text_atts": atts,
                "target_bbox": target}


class GroundingEvalDataset:
    def __init__(self, ann_files, transform, image_root, text_pre):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.image_root = image_root
        self.text_pre = text_pre

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        a = self.ann[index]
        img = open_image(a["image"], self.image_root)
        ids, atts = self.text_pre(a["text"])
        return {"image": self.transform(img).astype(np.float32),
                "text_ids": ids, "text_atts": atts,
                "ref_id": np.int64(a["ref_id"])}


class CaptioningTrainDataset:
    """COCO captioning with UniLM MLM preprocessing (reference
    captioning_dataset.py:99-202): standard variant (causal tril attention) or
    FG-free (insert [MASK] before each kept token, duplicated position ids,
    column-masked tril)."""

    def __init__(self, ann_files, transform, image_root, tokenizer, *,
                 prompt: str = "", max_tokens: int = 25, max_masks: int = 12,
                 mask_prob: float = 0.5, fg_free: bool = False,
                 rng: Optional[random.Random] = None):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.image_root = image_root
        self.tokenizer = tokenizer
        self.prompt_tokens = tokenizer.tokenize(prompt) if prompt else []
        self.max_tokens = max_tokens
        self.max_masks = max_masks
        self.fg_free = fg_free
        self.rng = rng or random.Random()
        self.mask_generator = TextMaskingGenerator(
            tokenizer, mask_prob, max_masks, mask_whole_word=True, rng=self.rng)
        self.pad_id = tokenizer.pad_token_id
        self.mask_token = tokenizer.mask_token

    def __len__(self):
        return len(self.ann)

    @property
    def seq_len(self):
        return self.max_tokens + (self.max_masks if self.fg_free else 0)

    def _tokens(self, caption):
        toks = self.tokenizer.tokenize(pre_caption(caption, self.max_tokens))
        toks = ([self.tokenizer.cls_token] + self.prompt_tokens + toks
                + [self.tokenizer.sep_token])
        return toks[: self.max_tokens]

    def preprocess(self, caption: str) -> Dict[str, np.ndarray]:
        toks = self._tokens(caption)
        n_src = len(self.prompt_tokens)
        if not self.fg_free:
            masked, masked_pos = self.mask_generator(list(toks),
                                                     num_source_tokens=n_src)
            ids = self.tokenizer.convert_tokens_to_ids(toks)
            masked_ids = [ids[p] for p in masked_pos]
            ids_masked = self.tokenizer.convert_tokens_to_ids(masked)
            L = self.max_tokens
            pad = L - len(ids_masked)
            ids_masked += [self.pad_id] * pad
            atts = np.tril(np.ones((L, L), np.int32))
            position_ids = np.arange(L, dtype=np.int32)
        else:
            _, masked_pos_ = self.mask_generator(list(toks),
                                                 num_source_tokens=n_src)
            masked_set = set(masked_pos_)
            tokens_masked, position_ids_l, masked_pos, masked_ids = [], [], [], []
            i = -1
            for p, t in enumerate(toks):
                i += 1
                if p in masked_set:
                    masked_pos.append(len(tokens_masked))
                    tokens_masked.append(self.mask_token)
                    tokens_masked.append(t)
                    position_ids_l.extend([i, i])
                    masked_ids.append(self.tokenizer.convert_tokens_to_ids(t))
                else:
                    tokens_masked.append(t)
                    position_ids_l.append(i)
            ids_masked = self.tokenizer.convert_tokens_to_ids(tokens_masked)
            L = self.max_tokens + self.max_masks
            atts = np.tril(np.ones((L, L), np.int32))
            for p in masked_pos:
                atts[:, p] = 0
                atts[p, p] = 1
            pad = L - len(ids_masked)
            ids_masked += [self.pad_id] * pad
            position_ids_l += list(range(i + 1, i + 1 + (L - len(position_ids_l))))
            position_ids = np.asarray(position_ids_l, np.int32)

        n_mask = len(masked_pos)
        pad_m = self.max_masks - n_mask
        masked_pos = list(masked_pos) + [0] * pad_m
        masked_ids = list(masked_ids) + [-100] * pad_m
        weight = [1.0] * n_mask + [0.0] * pad_m
        return {
            "text_ids_masked": np.asarray(ids_masked, np.int32),
            "text_atts_matrix": atts,
            "position_ids": position_ids,
            "masked_pos": np.asarray(masked_pos, np.int32),
            "masked_ids": np.asarray(masked_ids, np.int32),
            "masked_weight": np.asarray(weight, np.float32),
        }

    def __getitem__(self, index):
        a = self.ann[index]
        img = open_image(a["image"], self.image_root)
        caption = a["caption"]
        if isinstance(caption, list):
            caption = self.rng.choice(caption)
        out = self.preprocess(caption)
        out["image"] = self.transform(img).astype(np.float32)
        return out


class CaptioningSCSTDataset:
    """SCST variant (reference captioning_dataset.py:230
    coco_karpathy_train_scst): one row per *image*, carrying every ground-truth
    caption as a reward reference."""

    def __init__(self, ann_files, transform, image_root):
        by_image: Dict[str, List[str]] = {}
        for a in _load_annotations(ann_files):
            caps = a["caption"] if isinstance(a["caption"], list) else [a["caption"]]
            by_image.setdefault(a["image"], []).extend(str(c) for c in caps)
        self.items = sorted(by_image.items())
        self.transform = transform
        self.image_root = image_root

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        path, captions = self.items[index]
        img = open_image(path, self.image_root)
        return {"image": self.transform(img).astype(np.float32),
                "captions": captions}


class CaptioningEvalDataset:
    def __init__(self, ann_files, transform, image_root):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.image_root = image_root

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        a = self.ann[index]
        img = open_image(a["image"], self.image_root)
        image_id = a.get("image_id", index)
        if isinstance(image_id, str) and "_" in image_id:
            image_id = int(image_id.split("_")[-1].split(".")[0])
        return {"image": self.transform(img).astype(np.float32),
                "image_id": np.int64(image_id)}
