"""Video QA / retrieval fine-tune datasets (reference dataset/vqa_dataset.py:
msrvtt_qa_dataset:159, msvd_qa_dataset:275, next_qa_mc_dataset:651; video rows
of retrieval_dataset for itr_coco_msrvtt).

Videos are directories of frames or frame-path lists; ``sample_frame_ids``
gives the temporal sampling (train: random-per-segment, eval: middle)."""

from __future__ import annotations

import json
import os
import random
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from x2vlm_tpu.data.imageio import open_image

from x2vlm_tpu.data.pretrain import sample_frame_ids
from x2vlm_tpu.data.retrieval import _load_annotations
from x2vlm_tpu.data.tokenization import TextPreprocessor

__all__ = ["VideoQADataset", "VideoRetrievalDataset", "NextQAMCDataset",
           "load_frames"]


def load_frames(frame_source, transform, frame_len: int, training: bool,
                rng=None, video_root: str = "") -> np.ndarray:
    """frame_source: directory of ordered frame images OR a list of paths."""
    if isinstance(frame_source, str):
        path = os.path.join(video_root, frame_source)
        files = sorted(os.listdir(path))
        frames = [os.path.join(path, f) for f in files]
    else:
        frames = [os.path.join(video_root, f) for f in frame_source]
    ids = sample_frame_ids(len(frames), frame_len, training, rng)
    out = [transform(open_image(frames[i])) for i in ids]
    return np.stack(out).astype(np.float32)  # (F, H, W, 3)


class VideoQADataset:
    """Answer-vocabulary video QA (msrvtt/msvd style): classification over
    `answer_list`; ann: {video, question, answer}."""

    def __init__(self, ann_files, transform, video_root: str,
                 text_pre: TextPreprocessor, answer_list: Sequence[str],
                 frame_len: int = 5, training: bool = True,
                 rng: Optional[random.Random] = None):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.video_root = video_root
        self.text_pre = text_pre
        self.answer_to_id = {a: i for i, a in enumerate(answer_list)}
        self.frame_len = frame_len
        self.training = training
        self.rng = rng or random

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        a = self.ann[index]
        frames = load_frames(a["video"], self.transform, self.frame_len,
                             self.training, self.rng, self.video_root)
        ids, atts = self.text_pre(a["question"])
        label = self.answer_to_id.get(str(a.get("answer", "")), -100)
        return {"image": frames, "text_ids": ids, "text_atts": atts,
                "labels": np.int32(label)}


class VideoRetrievalDataset:
    """Video-text retrieval (itr_coco_msrvtt): same two-stage protocol as
    image retrieval with (F, H, W, 3) visual inputs.

    Doubles as a map-style train set (reference run.py:155-166 trains MSRVTT
    retrieval through Retrieval.py): ``__getitem__`` returns
    {image: (F,H,W,3), text_ids, text_atts, idx} rows with duplicate-video-
    aware ``idx``, the same contract as RetrievalTrainDataset."""

    def __init__(self, ann_files, transform, video_root: str,
                 text_pre: TextPreprocessor, frame_len: int = 5,
                 training: bool = False, rng=None):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.video_root = video_root
        self.text_pre = text_pre
        self.frame_len = frame_len
        self.training = training
        self.rng = rng or random
        self.vid_ids: Dict = {}
        for a in self.ann:
            vid = a.get("video_id", a["video"] if isinstance(a["video"], str)
                        else json.dumps(a["video"]))
            if vid not in self.vid_ids:
                self.vid_ids[vid] = len(self.vid_ids)

        self.texts: List[str] = []
        self.videos: List = []
        self.txt2img: Dict[int, int] = {}
        self.img2txt: Dict[int, List[int]] = {}
        ti = 0
        for vi, a in enumerate(self.ann):
            self.videos.append(a["video"])
            self.img2txt[vi] = []
            caps = a["caption"] if isinstance(a["caption"], list) else [a["caption"]]
            for cap in caps:
                self.texts.append(cap)
                self.img2txt[vi].append(ti)
                self.txt2img[ti] = vi
                ti += 1

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        a = self.ann[index]
        frames = load_frames(a["video"], self.transform, self.frame_len,
                             self.training, self.rng, self.video_root)
        caption = a["caption"]
        if isinstance(caption, list):
            caption = self.rng.choice(caption) if self.training else caption[0]
        ids, atts = self.text_pre(caption)
        vid = a.get("video_id", a["video"] if isinstance(a["video"], str)
                    else json.dumps(a["video"]))
        return {"image": frames, "text_ids": ids, "text_atts": atts,
                "idx": np.int32(self.vid_ids[vid])}

    def n_images(self):
        return len(self.videos)

    def n_texts(self):
        return len(self.texts)

    def image_batch(self, indices) -> np.ndarray:
        return np.stack([
            load_frames(self.videos[i], self.transform, self.frame_len,
                        self.training, self.rng, self.video_root)
            for i in indices])

    def text_batch(self, indices):
        ids, atts = [], []
        for i in indices:
            a, b = self.text_pre(self.texts[i])
            ids.append(a)
            atts.append(b)
        return np.stack(ids), np.stack(atts)


class NextQAMCDataset:
    """NExT-QA multiple choice (reference next_qa_mc_dataset,
    vqa_dataset.py:651): 5 candidate answers per question; the model scores
    each (question + candidate) against the video — emitted as 5 text rows
    per sample plus the correct index."""

    def __init__(self, ann_files, transform, video_root: str,
                 text_pre: TextPreprocessor, frame_len: int = 5,
                 num_options: int = 5, training: bool = True, rng=None):
        self.ann = _load_annotations(ann_files)
        self.transform = transform
        self.video_root = video_root
        self.text_pre = text_pre
        self.frame_len = frame_len
        self.num_options = num_options
        self.training = training
        self.rng = rng or random

    def __len__(self):
        return len(self.ann)

    def __getitem__(self, index):
        a = self.ann[index]
        frames = load_frames(a["video"], self.transform, self.frame_len,
                             self.training, self.rng, self.video_root)
        ids, atts = [], []
        for i in range(self.num_options):
            text = f"{a['question']} {a['options'][i]}"
            ii, aa = self.text_pre(text)
            ids.append(ii)
            atts.append(aa)
        return {"image": frames,
                "option_ids": np.stack(ids),      # (K, L)
                "option_atts": np.stack(atts),
                "labels": np.int32(a["answer"])}
