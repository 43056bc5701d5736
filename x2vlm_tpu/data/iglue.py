"""Multilingual IGLUE fine-tune datasets (reference: wit_dataset.py,
xflickrco_dataset.py, xvnli_dataset.py, and the MARVL/XGQA variants of
nlvr/vqa). These adapt the task-specific annotation schemas onto the generic
dataset interfaces (RetrievalEval/Train-compatible for WIT + xFlickrCO;
classification batches for XVNLI; NLVR batches for MARVL; VQA for XGQA).
"""

from __future__ import annotations

import base64
import io
import json
import os
import random
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from x2vlm_tpu.data.imageio import open_image

from x2vlm_tpu.data.tokenization import TextPreprocessor

__all__ = ["WITRetrievalDataset", "XFlickrCODataset", "XVNLIDataset",
           "MARVLDataset"]


def _read_jsonl(files) -> List[dict]:
    if isinstance(files, str):
        files = [files]
    out = []
    for f in files:
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
    return out


class WITRetrievalDataset:
    """WIT: JSONL {image_content: b64, image_url, caption_reference_description}
    (reference wit_dataset.py:25-98). Exposes the RetrievalEvalDataset
    interface for the shared two-stage protocol."""

    def __init__(self, ann_files, transform, text_pre: TextPreprocessor):
        self.ann = [a for a in _read_jsonl(ann_files)
                    if a.get("caption_reference_description")]
        self.transform = transform
        self.text_pre = text_pre
        self.texts = [a["caption_reference_description"] for a in self.ann]
        self.txt2img = {i: i for i in range(len(self.ann))}
        self.img2txt = {i: [i] for i in range(len(self.ann))}

    def n_images(self):
        return len(self.ann)

    def n_texts(self):
        return len(self.texts)

    def _image(self, i):
        raw = base64.b64decode(self.ann[i]["image_content"])
        return Image.open(io.BytesIO(raw)).convert("RGB")

    def image_batch(self, indices):
        return np.stack([self.transform(self._image(i))
                         for i in indices]).astype(np.float32)

    def text_batch(self, indices):
        ids, atts = [], []
        for i in indices:
            a, b = self.text_pre(self.texts[i])
            ids.append(a)
            atts.append(b)
        return np.stack(ids), np.stack(atts)

    # map-style train interface
    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        ids, atts = self.text_pre(self.texts[index])
        return {"image": self.transform(self._image(index)).astype(np.float32),
                "text_ids": ids, "text_atts": atts,
                "idx": np.int32(index)}


class XFlickrCODataset:
    """xFlickrCO: JSONL {sentences: [...], id, img_path} (reference
    xflickrco_dataset.py:21-76). Train rows flatten sentences; eval exposes the
    retrieval-eval tables."""

    def __init__(self, ann_files, transform, image_root, text_pre,
                 rng: Optional[random.Random] = None):
        raw = _read_jsonl(ann_files)
        self.transform = transform
        self.image_root = image_root
        self.text_pre = text_pre
        self.rng = rng or random

        self.images: List[str] = []
        self.texts: List[str] = []
        self.txt2img: Dict[int, int] = {}
        self.img2txt: Dict[int, List[int]] = {}
        self.rows = []
        img_ids: Dict = {}
        for a in raw:
            if a["id"] not in img_ids:
                img_ids[a["id"]] = len(self.images)
                self.images.append(a["img_path"])
                self.img2txt[img_ids[a["id"]]] = []
            ii = img_ids[a["id"]]
            for s in a["sentences"]:
                ti = len(self.texts)
                self.texts.append(s)
                self.txt2img[ti] = ii
                self.img2txt[ii].append(ti)
                self.rows.append({"caption": s, "img_index": ii})

    def n_images(self):
        return len(self.images)

    def n_texts(self):
        return len(self.texts)

    def _image(self, ii):
        return open_image(os.path.join(self.image_root,
                                       self.images[ii])).convert("RGB")

    def image_batch(self, indices):
        return np.stack([self.transform(self._image(i))
                         for i in indices]).astype(np.float32)

    def text_batch(self, indices):
        ids, atts = [], []
        for i in indices:
            a, b = self.text_pre(self.texts[i])
            ids.append(a)
            atts.append(b)
        return np.stack(ids), np.stack(atts)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, index):
        r = self.rows[index]
        ids, atts = self.text_pre(r["caption"])
        return {"image": self.transform(self._image(r["img_index"])).astype(np.float32),
                "text_ids": ids, "text_atts": atts,
                "idx": np.int32(r["img_index"])}


class XVNLIDataset:
    """XVNLI: JSONL {Flikr30kID, sentence2, gold_label} → 3-way classification
    (reference xvnli_dataset.py:13-55)."""

    LABELS = {"contradiction": 0, "entailment": 1, "neutral": 2}

    def __init__(self, ann_files, transform, image_root, text_pre):
        self.ann = [a for a in _read_jsonl(ann_files)
                    if a.get("gold_label") in self.LABELS]
        self.transform = transform
        self.image_root = image_root
        self.text_pre = text_pre

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        a = self.ann[index]
        img = open_image(os.path.join(
            self.image_root, a["Flikr30kID"] + ".jpg")).convert("RGB")
        ids, atts = self.text_pre(a["sentence2"])
        return {"image": self.transform(img).astype(np.float32),
                "text_ids": ids, "text_atts": atts,
                "labels": np.int32(self.LABELS[a["gold_label"]])}


class MARVLDataset:
    """MARVL: NLVR-style two-image reasoning in 5 languages; JSONL
    {left_img, right_img, caption, label} or NLVR-format
    {images: [l, r], sentence, label} with self-contained paths
    (reference marvl handling in nlvr_dataset.py + MARVL.py;
    image_root=None means annotation paths are used as-is,
    dataset/__init__.py:318-322)."""

    def __init__(self, ann_files, transform, image_root, text_pre):
        self.ann = _read_jsonl(ann_files)
        self.transform = transform
        self.image_root = image_root
        self.text_pre = text_pre

    def __len__(self):
        return len(self.ann)

    def _open(self, rpath):
        path = os.path.join(self.image_root, rpath) if self.image_root else rpath
        return open_image(path)

    def __getitem__(self, index):
        a = self.ann[index]
        if "images" in a:  # NLVR-format annotations
            left, right, caption = a["images"][0], a["images"][1], a["sentence"]
        else:
            left, right, caption = a["left_img"], a["right_img"], a["caption"]
        im0 = self._open(left)
        im1 = self._open(right)
        ids, atts = self.text_pre(caption)
        label = 1 if (a["label"] is True or str(a["label"]).lower() == "true") else 0
        return {"image0": self.transform(im0).astype(np.float32),
                "image1": self.transform(im1).astype(np.float32),
                "text_ids": ids, "text_atts": atts,
                "labels": np.int32(label)}
