"""ctypes binding for the native data-plane (native/dataplane.cpp): batched
base64 → JPEG/PNG decode → resize → CLIP-normalize in C++ threads.

Falls back transparently to the PIL path when the library can't be built
(x2vlm_tpu.data.pretrain streams accept either decoder). Build happens lazily
on first use (`make -C native` equivalent, ~2 s)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from x2vlm_tpu.data.transforms import CLIP_MEAN, CLIP_STD

__all__ = ["NativeDecoder", "NativeTrainTransform", "NativeBoxTransform",
           "load_dataplane", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdataplane.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "dataplane.cpp")
    if not os.path.exists(src):
        return False
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
           src, "-o", _LIB_PATH, "-ljpeg", "-lpng", "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def load_dataplane() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_NATIVE_DIR, "dataplane.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if (not os.path.exists(_LIB_PATH) or stale) and not _build():
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        _bind(lib)
    except (OSError, AttributeError):  # unloadable or stale-symbol .so
        return None
    _LIB = lib
    return _LIB


def _bind(lib: ctypes.CDLL) -> None:
    for name in ("dp_decode_batch_b64", "dp_decode_batch_raw"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
    lib.dp_b64_decode.restype = ctypes.c_int64
    lib.dp_b64_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_uint8)]
    # train path (decode → RandomResizedCrop → hflip → RandAugment → uint8)
    for name in ("dp_pretrain_batch_raw", "dp_pretrain_batch_b64"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
    lib.dp_crop_resize_u8.restype = ctypes.c_int
    lib.dp_crop_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.dp_aug_apply.restype = ctypes.c_int
    lib.dp_aug_apply.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]
    lib.dp_sample_params.restype = ctypes.c_int
    lib.dp_sample_params.argtypes = [
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    lib.dp_region_batch_raw.restype = ctypes.c_int
    lib.dp_region_batch_raw.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    lib.dp_image_dims.restype = ctypes.c_int
    lib.dp_image_dims.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int32)]


def native_available() -> bool:
    return load_dataplane() is not None


class NativeDecoder:
    """Batch decoder: list of base64 strings (or raw bytes) →
    (N, res, res, 3) float32 normalized NHWC + per-item ok mask."""

    FILTERS = {"bilinear": 0, "bicubic": 1}

    def __init__(self, image_res: int, num_threads: int = 8,
                 mean=CLIP_MEAN, std=CLIP_STD, filter: str = "bicubic"):
        self.lib = load_dataplane()
        if self.lib is None:
            raise RuntimeError("native dataplane unavailable (g++/libjpeg?)")
        self.res = image_res
        self.filter = self.FILTERS[filter]
        self.num_threads = num_threads
        self.mean = np.ascontiguousarray(mean, np.float32)
        self.std = np.ascontiguousarray(std, np.float32)

    def _call(self, fn, blob: bytes, offsets: np.ndarray, n: int):
        out = np.empty((n, self.res, self.res, 3), np.float32)
        status = np.empty(n, np.uint8)
        fn(
            blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, self.res,
            self.mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.num_threads, self.filter,
        )
        return out, status.astype(bool)

    def decode_b64(self, items: Sequence[str]):
        enc = [s.encode() if isinstance(s, str) else s for s in items]
        offsets = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(e) for e in enc], out=offsets[1:])
        blob = b"".join(enc)
        return self._call(self.lib.dp_decode_batch_b64, blob, offsets, len(enc))

    def decode_raw(self, items: Sequence[bytes]):
        offsets = np.zeros(len(items) + 1, np.int64)
        np.cumsum([len(e) for e in items], out=offsets[1:])
        blob = b"".join(items)
        return self._call(self.lib.dp_decode_batch_raw, blob, offsets, len(items))


# op ids mirror transforms.DEFAULT_AUGS order (dataplane.cpp apply_aug_op)
AUG_OP_IDS = {"Identity": 0, "AutoContrast": 1, "Equalize": 2,
              "Brightness": 3, "Sharpness": 4, "ShearX": 5, "ShearY": 6,
              "TranslateX": 7, "TranslateY": 8, "Rotate": 9}


class NativeTrainTransform:
    """The full pretrain image transform in one C++ pass: decode →
    RandomResizedCrop(scale, bicubic) → hflip(0.5) → RandAugment(n, m) →
    uint8 (res, res, 3). Same op set and sampling algorithm as
    ``transforms.pretrain_transform`` (PIL), with per-image splitmix64
    parameter streams seeded from ``rng``; pixel ops match PIL semantics
    (tests/test_native_train_path.py pins each op against PIL).

    ``wants_bytes = True`` signals streams to pass raw encoded bytes instead
    of a decoded PIL image (pretrain.ImageTextStream fast path)."""

    wants_bytes = True

    def __init__(self, image_res: int, scale=(0.2, 1.0), n: int = 2,
                 m: int = 7, hflip_prob: float = 0.5,
                 augs: Optional[Sequence[str]] = None, rng=None,
                 num_threads: int = 1):
        import random as _random

        from x2vlm_tpu.data.transforms import DEFAULT_AUGS

        self.lib = load_dataplane()
        if self.lib is None:
            raise RuntimeError("native dataplane unavailable (g++/libjpeg?)")
        self.res = image_res
        self.scale = scale
        self.n = n
        self.m = m
        self.hflip_prob = hflip_prob
        self.rng = rng or _random.Random()
        self.num_threads = num_threads
        ops = [AUG_OP_IDS[a] for a in (augs or DEFAULT_AUGS)]
        self.cand = np.asarray(ops, np.int32)

    def transform_batch(self, items: Sequence[bytes], b64: bool = False):
        """raw (or base64) encoded images → ((N, res, res, 3) uint8, ok)."""
        n = len(items)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(e) for e in items], out=offsets[1:])
        blob = b"".join(items)
        seeds = np.asarray([self.rng.getrandbits(64) for _ in range(n)],
                           np.uint64)
        out = np.empty((n, self.res, self.res, 3), np.uint8)
        status = np.empty(n, np.uint8)
        fn = (self.lib.dp_pretrain_batch_b64 if b64
              else self.lib.dp_pretrain_batch_raw)
        fn(blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
           n, self.res,
           seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
           float(self.scale[0]), float(self.scale[1]), float(self.hflip_prob),
           self.cand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           len(self.cand), self.n, float(self.m),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           self.num_threads)
        return out, status.astype(bool)

    def __call__(self, raw: bytes) -> np.ndarray:
        out, ok = self.transform_batch([raw])
        if not ok[0]:
            raise ValueError("broken image (native decode failed)")
        return out[0]


class NativeBoxTransform:
    """Region-stream pixel path in C++ (bbox-aware crop sampling stays in
    Python — it needs the annotation's boxes): ROI decode of the sampled
    crop → bicubic resample → hflip → BOX_AUGS RandAugment → uint8.
    Aug ops are drawn from this object's own rng (mirrors RandomAugment
    holding its own stream, so the caller's rng sequence is unchanged vs
    the PIL path)."""

    wants_bytes = True

    def __init__(self, image_res: int, n: int = 2, m: int = 7,
                 augs: Optional[Sequence[str]] = None, rng=None,
                 num_threads: int = 1):
        import random as _random

        from x2vlm_tpu.data.transforms import BOX_AUGS

        self.lib = load_dataplane()
        if self.lib is None:
            raise RuntimeError("native dataplane unavailable (g++/libjpeg?)")
        self.res = image_res
        self.n = n
        self.m = m
        self.augs = list(augs or BOX_AUGS)
        self.rng = rng or _random.Random()
        self.num_threads = num_threads
        # (lo, hi) per op id, derived from the PIL source of truth so a range
        # tweak in transforms._AUG_OPS cannot desynchronize the native path
        from x2vlm_tpu.data.transforms import _AUG_OPS

        self._ranges = {AUG_OP_IDS[name]: (float(lo), float(hi))
                        for name, (_, lo, hi) in _AUG_OPS.items()}

    def image_dims(self, raw: bytes):
        wh = np.empty(2, np.int32)
        if not self.lib.dp_image_dims(
                raw, len(raw), wh.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))):
            raise ValueError("broken image (header parse failed)")
        return int(wh[0]), int(wh[1])

    def region_batch(self, items: Sequence[bytes], boxes, flips):
        """raw images + full-res crop boxes (x0, y0, cw, ch) + flip flags →
        ((N, res, res, 3) uint8, ok). Aug ops drawn per image from self.rng."""
        n = len(items)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(e) for e in items], out=offsets[1:])
        blob = b"".join(items)
        boxes = np.ascontiguousarray(boxes, np.int32).reshape(n, 4)
        flips = np.ascontiguousarray(flips, np.uint8).reshape(n)
        ops = np.empty((n, self.n), np.int32)
        vals = np.empty((n, self.n), np.float32)
        for i in range(n):
            for a in range(self.n):
                op = AUG_OP_IDS[self.rng.choice(self.augs)]
                lo, hi = self._ranges[op]
                ops[i, a] = op
                vals[i, a] = lo + (hi - lo) * self.m / 10.0
        out = np.empty((n, self.res, self.res, 3), np.uint8)
        status = np.empty(n, np.uint8)
        self.lib.dp_region_batch_raw(
            blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, self.res,
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.num_threads)
        return out, status.astype(bool)
