"""Dataset factory (reference dataset/__init__.py:26-480 create_dataset):
one entry point mapping task names to dataset construction from the YAML
config. Returns (train_dataset, eval_dataset); either may be None, and
eval_dataset is a {language: dataset} dict for the multilingual tasks whose
``test_file`` is a dict (reference xre/marvl/xgqa/xvnli branches,
dataset/__init__.py:218-330).

Pretrain streams are built by x2vlm_tpu.run (they need host/worker wiring);
this factory covers the map-style fine-tune datasets:
  retrieval | xretrieval | vqa | xgqa | nlvr | marvl | grounding |
  captioning | video_qa | video_retrieval | xvnli | xflickrco | wit
"""

from __future__ import annotations

import json
import random
from typing import Optional, Tuple

from x2vlm_tpu.data import transforms as T
from x2vlm_tpu.data.tokenization import TextPreprocessor, build_tokenizer

__all__ = ["create_dataset"]


def _per_split(files, build):
    """Reference multilingual eval: test_file may be {lang: path} →
    {lang: dataset} (dataset/__init__.py:221-227,315-330)."""
    if isinstance(files, dict):
        return {k: build(v) for k, v in files.items()}
    return build(files)


def create_dataset(task: str, config, evaluate: bool = False,
                   tokenizer=None, rng: Optional[random.Random] = None
                   ) -> Tuple[Optional[object], Optional[object]]:
    tokenizer = tokenizer or build_tokenizer(config["text_encoder"])
    res = config["image_res"]
    pre = TextPreprocessor(tokenizer, max_tokens=config.get("max_tokens", 40),
                           max_words=config.get("max_words",
                                                config.get("max_tokens", 40)))
    train_tf = T.train_transform(res, rng=rng)
    test_tf = T.test_transform(res)
    rng = rng or random

    def train_files():
        return config["train_file"]

    def test_files():
        return config["test_file"]

    if task in ("retrieval", "xretrieval", "xre", "itr_coco", "itr_flickr"):
        from x2vlm_tpu.data.retrieval import (
            RetrievalEvalDataset, RetrievalTrainDataset,
        )

        ev = _per_split(test_files(), lambda f: RetrievalEvalDataset(
            f, test_tf, config["image_root"], pre))
        if evaluate:
            return None, ev
        return RetrievalTrainDataset(train_files(), train_tf,
                                     config["image_root"], pre, rng=rng), ev

    if task in ("vqa", "xgqa"):
        from x2vlm_tpu.data.finetune import VQAEvalDataset, VQATrainDataset

        root = config.get("vqa_root", config.get("image_root"))
        if config.get("vg_root"):
            # Visual-Genome rows carry dataset: "vg" and resolve against
            # vg_root (reference vqa_dataset.py:19,  dataset/__init__.py:239)
            root = {"vqa": root, "vg": config["vg_root"]}
        a_max = config.get("answer_max_tokens", 10)

        def build_eval(f):
            # xgqa test entries may be [path, answer_list] pairs
            # (reference dataset/__init__.py:296-299)
            ans = config.get("answer_list")
            if isinstance(f, (list, tuple)) and len(f) == 2 and \
                    isinstance(f[1], str) and f[1].endswith(".json"):
                f, ans = f[0], f[1]
            return VQAEvalDataset(f, test_tf, root, pre, tokenizer,
                                  answer_list_file=ans,
                                  answer_max_tokens=a_max)

        ev = _per_split(test_files(), build_eval)
        if evaluate:
            return None, ev
        return VQATrainDataset(train_files(), train_tf, root, pre, tokenizer,
                               answer_max_tokens=a_max, rng=rng), ev

    if task == "nlvr":
        from x2vlm_tpu.data.finetune import NLVRDataset

        ev = _per_split(test_files(), lambda f: NLVRDataset(
            f, test_tf, config["image_root"], pre))
        if evaluate:
            return None, ev
        return NLVRDataset(train_files(), train_tf, config["image_root"], pre), ev

    if task == "marvl":
        # MARVL trains on English NLVR2 and zero-shots the multilingual test
        # sets; 'en' test = NLVR2 with image_root, others carry their own
        # paths (reference dataset/__init__.py:313-324)
        from x2vlm_tpu.data.finetune import NLVRDataset
        from x2vlm_tpu.data.iglue import MARVLDataset

        def build_eval(f, lang=None):
            if lang == "en":
                return NLVRDataset(f, test_tf, config["image_root"], pre)
            return MARVLDataset(f, test_tf,
                                config.get("marvl_image_root"), pre)

        files = test_files()
        if isinstance(files, dict):
            ev = {k: build_eval(v, lang=k) for k, v in files.items()}
        else:
            ev = build_eval(files)
        if evaluate:
            return None, ev
        return NLVRDataset(train_files(), train_tf, config["image_root"], pre), ev

    if task in ("grounding", "refcoco_bbox"):
        from x2vlm_tpu.data.finetune import (
            GroundingEvalDataset, GroundingTrainDataset,
        )

        ev = GroundingEvalDataset(test_files(), test_tf, config["image_root"], pre)
        if evaluate:
            return None, ev
        tr = GroundingTrainDataset(
            train_files(), T.box_transform(rng=rng), config["image_root"], pre,
            image_res=res, careful_hflip=config.get("careful_hflip", True),
            rng=rng)
        return tr, ev

    if task in ("captioning", "coco_captioning_mlm"):
        from x2vlm_tpu.data.finetune import (
            CaptioningEvalDataset, CaptioningTrainDataset,
        )

        ev = CaptioningEvalDataset(test_files(), test_tf, config["image_root"])
        if evaluate:
            return None, ev
        tr = CaptioningTrainDataset(
            train_files(), T.train_transform(res, with_hflip=False, rng=rng),
            config["image_root"], tokenizer, prompt=config.get("prompt", ""),
            max_tokens=config.get("max_tokens", 25),
            max_masks=config.get("max_masks", 12),
            mask_prob=config.get("mask_prob", 0.5),
            fg_free=config.get("fg_free", False), rng=rng)
        return tr, ev

    if task in ("video_qa", "vqa_msrvtt", "vqa_msvd"):
        from x2vlm_tpu.data.video import VideoQADataset

        with open(config["answer_list"]) as f:
            answers = json.load(f)
        kw = dict(video_root=config["video_root"], text_pre=pre,
                  answer_list=answers, frame_len=config.get("frame_len", 5))
        ev = _per_split(test_files(), lambda f: VideoQADataset(
            f, test_tf, training=False, **kw))
        if evaluate:
            return None, ev
        return VideoQADataset(train_files(), train_tf, **kw), ev

    if task in ("next_qa_mc", "video_qa_mc"):
        from x2vlm_tpu.data.video import NextQAMCDataset

        kw = dict(video_root=config["video_root"], text_pre=pre,
                  frame_len=config.get("frame_len", 5),
                  num_options=config.get("num_options", 5))
        ev = _per_split(test_files(), lambda f: NextQAMCDataset(
            f, test_tf, training=False, **kw))
        if evaluate:
            return None, ev
        return NextQAMCDataset(train_files(), train_tf, training=True,
                               rng=rng, **kw), ev

    if task in ("video_retrieval", "itr_coco_msrvtt"):
        from x2vlm_tpu.data.video import VideoRetrievalDataset

        ev = _per_split(test_files(), lambda f: VideoRetrievalDataset(
            f, test_tf, config["video_root"], pre,
            frame_len=config.get("frame_len", 5)))
        if evaluate:
            return None, ev
        # trains through the standard retrieval path (reference run.py:155-166
        # launches Retrieval.py on MSRVTT)
        tr = VideoRetrievalDataset(
            train_files(), train_tf, config["video_root"], pre,
            frame_len=config.get("frame_len", 5), training=True, rng=rng)
        return tr, ev

    if task == "xvnli":
        from x2vlm_tpu.data.iglue import XVNLIDataset

        ev = _per_split(test_files(), lambda f: XVNLIDataset(
            f, test_tf, config["image_root"], pre))
        if evaluate:
            return None, ev
        return XVNLIDataset(train_files(), train_tf, config["image_root"], pre), ev

    if task == "xflickrco":
        from x2vlm_tpu.data.iglue import XFlickrCODataset

        ev = _per_split(test_files(), lambda f: XFlickrCODataset(
            f, test_tf, config["image_root"], pre))
        if evaluate:
            return None, ev
        return XFlickrCODataset(train_files(), train_tf, config["image_root"],
                                pre, rng=rng), ev

    if task == "wit":
        from x2vlm_tpu.data.iglue import WITRetrievalDataset

        ev = _per_split(test_files(), lambda f: WITRetrievalDataset(
            f, test_tf, pre))
        if evaluate:
            return None, ev
        return WITRetrievalDataset(train_files(), train_tf, pre), ev

    raise ValueError(f"unknown dataset task {task!r}")
