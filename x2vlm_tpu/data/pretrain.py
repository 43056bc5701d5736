"""Pretraining data streams (reference dataset/pretrain_dataset.py, 785 LoC):
image-text, region-text, video-frame-text, and text-only JSONL streams over
the sharded line reader, emitting fixed-shape numpy samples/batches.

Broken samples are skipped with a traceback-free counter (reference
:236-240 prints tracebacks; here a counter keeps logs clean)."""

from __future__ import annotations

import io
import math
import random
from base64 import b64decode
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageFile

from x2vlm_tpu.data.loader import collate
from x2vlm_tpu.data.streaming import DistLineReader
from x2vlm_tpu.data.tokenization import TextPreprocessor
from x2vlm_tpu.data.transforms import hflip, normalize

ImageFile.LOAD_TRUNCATED_IMAGES = True
Image.MAX_IMAGE_PIXELS = None  # hardening (reference pretrain_dataset.py:28-29)

__all__ = ["ImageTextStream", "TextStream", "RegionTextStream",
           "VideoTextStream", "region_collate", "sample_frame_ids",
           "sample_clip_ids"]


def _open_image(ann: dict, image_key: str, is_rpath: bool) -> Image.Image:
    if is_rpath:
        from x2vlm_tpu.data.imageio import open_image

        return open_image(ann[image_key])
    return Image.open(io.BytesIO(b64decode(ann[image_key]))).convert("RGB")


def _read_image_bytes(ann: dict, image_key: str, is_rpath: bool) -> bytes:
    """Raw encoded bytes for transforms with ``wants_bytes`` (the native
    decode+augment path skips the PIL round-trip entirely)."""
    if not is_rpath:
        return b64decode(ann[image_key])
    path = ann[image_key]
    from x2vlm_tpu.data.imageio import is_remote

    if is_remote(path):
        from x2vlm_tpu.core.io import hopen

        with hopen(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def _choose_caption(caption, rng) -> str:
    if isinstance(caption, list):
        return rng.choice(caption)
    return caption


class _StreamBase:
    def __init__(self, reader: DistLineReader, text_pre: TextPreprocessor,
                 rng: Optional[random.Random] = None):
        self.reader = reader
        self.text_pre = text_pre
        self.rng = rng or random.Random()
        self.broken = 0


class ImageTextStream(_StreamBase):
    """JSONL {image_key: b64|path, caption_key: str|[str]} → multimodal MLM
    samples (reference ImageTextJsonDataset:131-287)."""

    def __init__(self, reader, text_pre, transform: Callable,
                 image_key: str = "binary", caption_key: str = "desc",
                 is_image_rpath: bool = False, rng=None):
        super().__init__(reader, text_pre, rng)
        self.transform = transform
        self.image_key = image_key
        self.caption_key = caption_key
        self.is_image_rpath = is_image_rpath

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if getattr(self.transform, "wants_bytes", False):
            # native decode+augment: no PIL round-trip; chunked so the C++
            # thread pool (GIL-free) overlaps decode across samples. Seeds
            # are drawn per image in stream order, so the output is
            # bit-identical for any chunk size / thread count.
            yield from self._iter_native()
            return
        for ann in self.reader.iter_json():
            try:
                img = _open_image(ann, self.image_key, self.is_image_rpath)
                image = np.asarray(self.transform(img))  # f32 or uint8 (on-
                                                         # device normalize)
                yield self._text_sample(ann, image)
            except Exception:
                self.broken += 1

    def _text_sample(self, ann: dict, image: np.ndarray) -> Dict:
        caption = _choose_caption(ann[self.caption_key], self.rng)
        ids, atts, ids_masked, pos, labels = self.text_pre(
            caption, with_masking=True)
        return {"image": image, "text_ids": ids, "text_atts": atts,
                "text_ids_masked": ids_masked, "masked_pos": pos,
                "masked_ids": labels}

    def _iter_native(self) -> Iterator[Dict[str, np.ndarray]]:
        chunk = max(1, 4 * getattr(self.transform, "num_threads", 1))
        pending: List = []

        def flush():
            images, ok = self.transform.transform_batch(
                [raw for raw, _ in pending])
            for i, (_, ann) in enumerate(pending):
                if not ok[i]:
                    self.broken += 1
                    continue
                try:
                    yield self._text_sample(ann, images[i])
                except Exception:
                    self.broken += 1
            pending.clear()

        for ann in self.reader.iter_json():
            try:
                pending.append((_read_image_bytes(
                    ann, self.image_key, self.is_image_rpath), ann))
            except Exception:
                self.broken += 1
                continue
            if len(pending) >= chunk:
                yield from flush()
        if pending:
            yield from flush()


class TextStream(_StreamBase):
    """Text-only MLM stream (reference TextJsonDataset:663-785)."""

    def __init__(self, reader, text_pre, caption_key: str = "text", rng=None):
        super().__init__(reader, text_pre, rng)
        self.caption_key = caption_key

    def __iter__(self):
        for ann in self.reader.iter_json():
            try:
                caption = _choose_caption(ann[self.caption_key], self.rng)
                ids, atts, ids_masked, pos, labels = self.text_pre(
                    caption, with_masking=True)
                yield {"text_ids": ids, "text_atts": atts,
                       "text_ids_masked": ids_masked, "masked_pos": pos,
                       "masked_ids": labels}
            except Exception:
                self.broken += 1


def sample_frame_ids(n_frames: int, frame_len: int, training: bool,
                     rng: Optional[random.Random] = None) -> List[int]:
    """Temporal sampling (reference dataset/utils.py:66-92): split the video
    into frame_len segments; training picks a random frame per segment, eval
    the middle; short videos wrap."""
    rng = rng or random
    if n_frames <= frame_len:
        return [i % n_frames for i in range(frame_len)]
    seg = n_frames / frame_len
    ids = []
    for i in range(frame_len):
        lo = int(math.floor(seg * i))
        hi = max(lo, int(math.floor(seg * (i + 1))) - 1)
        ids.append(rng.randint(lo, hi) if training else (lo + hi) // 2)
    return ids


def sample_clip_ids(clips, minimum_frames: int, clip_captions=None,
                    skip_caption_set=None, rng=None):
    """Pick a contiguous run of clips around a random anchor until the frame
    count reaches ``minimum_frames`` (reference dataset/utils.py:19-63);
    skip-set clips contribute no frames and are dropped from the result."""
    rng = rng or random
    skip_caption_set = skip_caption_set or set()
    caps = [c.strip() for c in clip_captions] if clip_captions else None

    def count(ids):
        return sum(len(clips[i]) for i in ids
                   if caps is None or caps[i] not in skip_caption_set)

    mid = rng.randrange(len(clips))
    ids, left, right = [mid], mid, mid
    while count(ids) < minimum_frames and len(ids) < len(clips):
        if left - 1 < 0:
            right += 1
            ids.append(right)
        elif right + 1 >= len(clips):
            left -= 1
            ids.append(left)
        elif rng.random() < 0.5:
            right += 1
            ids.append(right)
        else:
            left -= 1
            ids.append(left)
    ids = sorted(ids)
    if caps is not None:
        ids = [i for i in ids if caps[i] not in skip_caption_set]
    return ids


class VideoTextStream(_StreamBase):
    """Frame-list videos → (frame_len, H, W, 3) samples (reference
    FrameTextDataset:290-424). Clip-structured annotations (frames = list of
    clips, each a frame list, with per-clip captions) either sample one clip
    or — with ``combine_continuous_clips`` on ``is_continuous`` rows — merge
    neighbouring clips until ``minimum_frames_before_sampling`` frames and
    join their captions (reference get_clips/get_caption:321-369)."""

    def __init__(self, reader, text_pre, transform, frame_len: int = 3,
                 frames_key: str = "frames", caption_key: str = "caption",
                 is_image_rpath: bool = False, training: bool = True,
                 skip_captions: Sequence[str] = ("[Music]",),
                 combine_continuous_clips: bool = False,
                 minimum_frames_before_sampling: int = -1, rng=None):
        super().__init__(reader, text_pre, rng)
        self.transform = transform
        self.frame_len = frame_len
        self.frames_key = frames_key
        self.caption_key = caption_key
        self.is_image_rpath = is_image_rpath
        self.training = training
        self.skip_captions = set(skip_captions)
        self.combine_continuous_clips = combine_continuous_clips
        self.minimum_frames_before_sampling = minimum_frames_before_sampling
        if combine_continuous_clips:
            assert minimum_frames_before_sampling > 0, \
                "combine_continuous_clips needs minimum_frames_before_sampling"

    def _get_clips(self, clips, captions, is_continuous):
        """→ (frames, clip_ids) — reference get_clips (pretrain_dataset.py:
        321-345)."""
        if len(clips) == 1:
            return clips[0], [0]
        if is_continuous and self.combine_continuous_clips:
            ids = sample_clip_ids(
                clips, self.minimum_frames_before_sampling,
                clip_captions=captions, skip_caption_set=self.skip_captions,
                rng=self.rng)
            return [f for i in ids for f in clips[i]], ids
        if not isinstance(captions, list):
            # one caption for all clips (the reference asserts list here; a
            # string row would index characters) — any clip is eligible
            i = self.rng.randrange(len(clips))
            return clips[i], [i]
        # uniform over eligible clips (HowTo100M music rows are skipped);
        # bounded, unlike rejection sampling — an all-skipped row raises and
        # is counted broken by __iter__ instead of hanging the producer
        eligible = [j for j, c in enumerate(captions)
                    if c not in self.skip_captions]
        if not eligible:
            raise ValueError("all clip captions in skip set")
        i = self.rng.choice(eligible)
        return clips[i], [i]

    def __iter__(self):
        for ann in self.reader.iter_json():
            try:
                frames = ann[self.frames_key]
                raw_cap = ann[self.caption_key]
                if frames and isinstance(frames[0], list):
                    # clip-of-clips rows (stage-2 video pretraining)
                    frames, clip_ids = self._get_clips(
                        frames, raw_cap, ann.get("is_continuous", False))
                    caption = " ".join(raw_cap[i] for i in clip_ids) \
                        if isinstance(raw_cap, list) else raw_cap
                else:
                    caption = _choose_caption(raw_cap, self.rng)
                if not caption or caption in self.skip_captions:
                    continue
                ids = sample_frame_ids(len(frames), self.frame_len,
                                       self.training, self.rng)
                if getattr(self.transform, "wants_bytes", False):
                    # native path: all sampled frames in one C++ call
                    raws = [_read_image_bytes({"f": frames[fi]}, "f",
                                              self.is_image_rpath)
                            for fi in ids]
                    imgs, ok = self.transform.transform_batch(raws)
                    if not ok.all():
                        raise ValueError("broken frame")
                    image = imgs  # (F, H, W, 3)
                else:
                    imgs = []
                    for fi in ids:
                        img = _open_image({"f": frames[fi]}, "f",
                                          self.is_image_rpath)
                        imgs.append(np.asarray(self.transform(img)))
                    image = np.stack(imgs)  # (F, H, W, 3)
                t_ids, atts, ids_masked, pos, labels = self.text_pre(
                    caption, with_masking=True)
                yield {"image": image, "text_ids": t_ids, "text_atts": atts,
                       "text_ids_masked": ids_masked, "masked_pos": pos,
                       "masked_ids": labels}
            except Exception:
                self.broken += 1


class RegionTextStream(_StreamBase):
    """Region-text stream (reference RegionTextJsonDataset:427-610): bbox-aware
    random crop, careful hflip, per-region captions + patch attention bitmaps
    + normalized target boxes, plus an optional full-image caption row."""

    def __init__(self, reader, text_pre, box_transform: Callable, *,
                 image_res: int, patch_size: int, max_regions: int = 5,
                 min_perc_in_image: float = 0.5, careful_hflip: bool = True,
                 image_key: str = "binary", is_image_rpath: bool = False,
                 rng=None):
        super().__init__(reader, text_pre, rng)
        self.box_transform = box_transform
        self.image_res = image_res
        self.patch_size = patch_size
        self.num_patch = image_res // patch_size
        self.max_regions = max_regions
        self.min_perc = min_perc_in_image
        self.careful_hflip = careful_hflip
        self.image_key = image_key
        self.is_image_rpath = is_image_rpath

    def get_image_attns(self, x, y, w, h) -> np.ndarray:
        """Patch bitmap over the region + CLS (reference :595-610)."""
        P = self.num_patch
        ps = self.patch_size
        x_min = min(math.floor(x / ps), P - 1)
        x_max = max(x_min + 1, min(math.ceil((x + w) / ps), P))
        y_min = min(math.floor(y / ps), P - 1)
        y_max = max(y_min + 1, min(math.ceil((y + h) / ps), P))
        atts = np.zeros(1 + P * P, np.float32)
        atts[0] = 1
        for j in range(x_min, x_max):
            for i in range(y_min, y_max):
                atts[P * i + j + 1] = 1
        return atts

    def _left_right_in_captions(self, ann) -> bool:
        def _in(caption):
            caps = caption if isinstance(caption, list) else [caption]
            return any(("left" in c) or ("right" in c) for c in caps)

        if "caption" in ann and _in(ann["caption"]):
            return True
        return any("caption" in e and _in(e["caption"]) for e in ann["elems"])

    def __iter__(self):
        for ann in self.reader.iter_json():
            try:
                yield self._one(ann)
            except Exception:
                self.broken += 1

    def _one(self, ann: dict) -> Dict:
        rng = self.rng
        native = getattr(self.box_transform, "wants_bytes", False)
        if native:
            raw = _read_image_bytes(ann, self.image_key, self.is_image_rpath)
            W, H = self.box_transform.image_dims(raw)
        else:
            img = _open_image(ann, self.image_key, self.is_image_rpath)
            W, H = img.size
        x, y, w, h = [int(v) for v in rng.choice(ann["elems"])["bb"]]
        assert x >= 0 and y >= 0 and x + w <= W and y + h <= H and w > 0 and h > 0

        x0, y0 = rng.randint(0, x), rng.randint(0, y)
        x1 = rng.randint(min(x + w, W), W)
        y1 = rng.randint(min(y + h, H), H)
        w0, h0 = x1 - x0, y1 - y0

        do_hflip = bool(rng.random() < 0.5 and not (
            self.careful_hflip and self._left_right_in_captions(ann)))

        if native:
            # pixel work (ROI decode + crop-resize + flip + augs) in C++;
            # uint8 transport with on-device normalize
            imgs, ok = self.box_transform.region_batch(
                [raw], [(x0, y0, w0, h0)], [do_hflip])
            if not ok[0]:
                raise ValueError("broken image")
            image = imgs[0]
            W, H = w0, h0
        else:
            img = img.crop((x0, y0, x1, y1))
            W, H = img.size
            if do_hflip:
                img = hflip(img)
            img = img.resize((self.image_res, self.image_res), Image.BICUBIC)
            image = self.box_transform(img).astype(np.float32)

        rows: List[Dict] = []
        max_elems = self.max_regions
        if "caption" in ann:
            cap = _choose_caption(ann["caption"], rng)
            ids, atts, ids_m, pos, labels = self.text_pre(cap, with_masking=True)
            rows.append({
                "text_ids": ids, "text_atts": atts, "text_ids_masked": ids_m,
                "masked_pos": pos, "masked_ids": labels,
                "image_atts": np.ones(1 + self.num_patch ** 2, np.float32),
                "target_bbox": np.asarray([0.5, 0.5, 1, 1], np.float32),
                "is_image": np.float32(1),
            })
            max_elems -= 1

        elems = list(ann["elems"])
        rng.shuffle(elems)
        for elem in elems:
            if max_elems <= 0:
                break
            x, y, w, h = [int(v) for v in elem["bb"]]
            xx, yy = max(x0, x), max(y0, y)
            xm, ym = min(x0 + w0, x + w), min(y0 + h0, y + h)
            if not (xm > xx and ym > yy):
                continue
            if (xm - xx) * (ym - yy) / (w * h) <= self.min_perc:
                continue
            x, y, w, h = xx - x0, yy - y0, xm - xx, ym - yy
            if do_hflip:
                x = (W - x) - w
            x = self.image_res / W * x
            w = self.image_res / W * w
            y = self.image_res / H * y
            h = self.image_res / H * h

            cap = _choose_caption(elem["caption"], rng)
            if "attributes" in elem:
                cap = _choose_caption(elem["attributes"], rng) + " " + cap
            ids, atts, ids_m, pos, labels = self.text_pre(cap, with_masking=True)
            rows.append({
                "text_ids": ids, "text_atts": atts, "text_ids_masked": ids_m,
                "masked_pos": pos, "masked_ids": labels,
                "image_atts": self.get_image_attns(x, y, w, h),
                "target_bbox": np.asarray(
                    [(x + w / 2) / self.image_res, (y + h / 2) / self.image_res,
                     w / self.image_res, h / self.image_res], np.float32),
                "is_image": np.float32(0),
            })
            max_elems -= 1

        assert rows, "no valid regions"
        return {"image": image, "rows": rows}


def region_collate(samples: Sequence[Dict], batch_size: int, max_images: int,
                   rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
    """Fixed-shape region batch (reference collate_fn:612-660): flatten region
    rows across up to max_images images, sample/pad to exactly batch_size rows,
    emit idx_to_group_img. Images are padded to max_images (static shape)."""
    rng = rng or random
    samples = list(samples)[:max_images]
    images = [s["image"] for s in samples]
    rows, idx_to_group = [], []
    for ii, s in enumerate(samples):
        for r in s["rows"]:
            rows.append(r)
            idx_to_group.append(ii)

    n = len(rows)
    if n >= batch_size:
        keep = rng.sample(range(n), batch_size)
    else:
        keep = list(range(n))
        while len(keep) < batch_size:
            keep.append(rng.choice(range(n)))
    batch = collate([rows[i] for i in keep])
    batch["idx_to_group_img"] = np.asarray([idx_to_group[i] for i in keep],
                                           np.int32)
    while len(images) < max_images:
        images.append(np.zeros_like(images[0]))
    batch["image"] = np.stack(images)
    return batch
