"""Native C++ train-path augmentation vs the PIL pretrain transform.

Each pixel op is pinned against its PIL reference with tight tolerances
(LUT/affine ops exact; resample/blend ops within rounding); the parameter
sampler is pinned against a Python reimplementation of the same splitmix64
stream; the end-to-end batch path is checked for shape/brokenness and
distributional agreement with transforms.pretrain_transform."""

import ctypes
import io
import math
import random

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from x2vlm_tpu.data.native import (AUG_OP_IDS, NativeTrainTransform,
                                   load_dataplane, native_available)
from x2vlm_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native dataplane not built")


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _img(rng, h=48, w=56):
    return np.ascontiguousarray(rng.integers(0, 256, (h, w, 3), np.uint8))


def _aug_apply(arr, op, v):
    lib = load_dataplane()
    out = np.empty_like(arr)
    lib.dp_aug_apply(_u8p(arr), arr.shape[0], arr.shape[1], op,
                     ctypes.c_float(v), _u8p(out))
    return out


def _crop_resize(arr, box, res, filter=1):
    lib = load_dataplane()
    out = np.empty((res, res, 3), np.uint8)
    x0, y0, cw, ch = box
    lib.dp_crop_resize_u8(_u8p(arr), arr.shape[1], arr.shape[0], x0, y0, cw,
                          ch, res, filter, _u8p(out))
    return out


# ---------------------------------------------------------------- pixel ops

@pytest.mark.parametrize("name,pil_fn", [
    ("AutoContrast", lambda im, v: ImageOps.autocontrast(im)),
    ("Equalize", lambda im, v: ImageOps.equalize(im)),
])
def test_lut_ops_exact(rng, name, pil_fn):
    arr = _img(rng)
    ref = np.asarray(pil_fn(Image.fromarray(arr), 0.0))
    out = _aug_apply(arr, AUG_OP_IDS[name], 0.0)
    np.testing.assert_array_equal(out, ref)


def test_autocontrast_narrow_histogram(rng):
    # stress the lo/hi search: channel values confined to [100, 120]
    arr = (rng.integers(100, 121, (32, 32, 3))).astype(np.uint8)
    ref = np.asarray(ImageOps.autocontrast(Image.fromarray(arr)))
    out = _aug_apply(arr, AUG_OP_IDS["AutoContrast"], 0.0)
    np.testing.assert_array_equal(out, ref)


def test_brightness_matches_pil(rng):
    arr = _img(rng)
    for v in (0.1, 1.0, 1.36, 1.9):
        ref = np.asarray(ImageEnhance.Brightness(
            Image.fromarray(arr)).enhance(v), np.int16)
        out = _aug_apply(arr, AUG_OP_IDS["Brightness"], v).astype(np.int16)
        assert np.abs(out - ref).max() <= 1, v


def test_sharpness_matches_pil(rng):
    arr = _img(rng)
    for v in (0.1, 1.36, 1.9):
        ref = np.asarray(ImageEnhance.Sharpness(
            Image.fromarray(arr)).enhance(v), np.int16)
        out = _aug_apply(arr, AUG_OP_IDS["Sharpness"], v).astype(np.int16)
        diff = np.abs(out - ref)
        assert diff.max() <= 2 and (diff > 1).mean() < 0.01, v


@pytest.mark.parametrize("name,v", [
    ("ShearX", 0.18), ("ShearX", -0.3), ("ShearY", 0.18), ("ShearY", -0.3),
    ("TranslateX", 0.18), ("TranslateY", -0.18),
    ("Rotate", 12.0), ("Rotate", -30.0),
])
def test_affine_ops_exact(rng, name, v):
    arr = _img(rng)
    img = Image.fromarray(arr)
    fn, _, _ = T._AUG_OPS[name]
    ref = np.asarray(fn(img, v))
    out = _aug_apply(arr, AUG_OP_IDS[name], v)
    # nearest-neighbor: identical source-pixel choice except where float
    # rounding flips a coordinate that lands exactly on a pixel boundary
    mismatch = (out.astype(np.int16) != ref.astype(np.int16)).any(-1).mean()
    assert mismatch < 0.02, (name, v, mismatch)


def test_identity_op(rng):
    arr = _img(rng)
    np.testing.assert_array_equal(_aug_apply(arr, AUG_OP_IDS["Identity"], 0.0),
                                  arr)


def test_crop_resize_matches_pil(rng):
    arr = _img(rng, 75, 90)
    img = Image.fromarray(arr)
    for box, res in (((10, 5, 60, 64), 48), ((0, 0, 90, 75), 32),
                     ((3, 2, 17, 21), 48)):  # down- and up-scaling
        x0, y0, cw, ch = box
        ref = np.asarray(img.crop((x0, y0, x0 + cw, y0 + ch)).resize(
            (res, res), Image.BICUBIC), np.int16)
        out = _crop_resize(arr, box, res).astype(np.int16)
        diff = np.abs(out - ref)
        assert np.median(diff) <= 1 and (diff > 2).mean() < 0.02, (box, res)


# ------------------------------------------------------------- the sampler

def _splitmix64_stream(seed):
    mask = (1 << 64) - 1
    s = seed & mask

    def next_u64():
        nonlocal s
        s = (s + 0x9E3779B97F4A7C15) & mask
        z = s
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    def uniform():
        return (next_u64() >> 11) * (1.0 / 9007199254740992.0)

    return uniform


def _py_sample(seed, w, h, scale=(0.2, 1.0), hflip_prob=0.5, cand=None,
               n=2, m=7.0):
    """Python mirror of dataplane.cpp sample_train_params (the contract the
    C++ sampler implements — same algorithm as transforms.random_resized_crop
    driven by the same splitmix64 uniforms)."""
    cand = cand if cand is not None else list(range(10))
    u = _splitmix64_stream(seed)
    area = w * h
    log_lo, log_hi = math.log(3 / 4), math.log(4 / 3)

    def randint(hi):
        return min(hi, int(u() * (hi + 1)))

    crop = None
    for _ in range(10):
        target = area * (scale[0] + u() * (scale[1] - scale[0]))
        aspect = math.exp(log_lo + u() * (log_hi - log_lo))
        cw = int(math.floor(math.sqrt(target * aspect) + 0.5))
        ch = int(math.floor(math.sqrt(target / aspect) + 0.5))
        if 0 < cw <= w and 0 < ch <= h:
            crop = (randint(w - cw), randint(h - ch), cw, ch)
            break
    if crop is None:
        s = min(w, h)
        crop = ((w - s) // 2, (h - s) // 2, s, s)
    flip = 1 if u() < hflip_prob else 0
    ops, vals = [], []
    for _ in range(n):
        op = cand[min(len(cand) - 1, int(u() * len(cand)))]
        lo, hi = {3: (0.1, 1.9), 4: (0.1, 1.9), 9: (-30.0, 30.0)}.get(
            op, (0.0, 0.0) if op < 5 else (-0.3, 0.3))
        ops.append(op)
        vals.append(lo + (hi - lo) * m / 10.0)
    return crop, flip, ops, vals


def test_sampler_matches_python_mirror():
    lib = load_dataplane()
    cand = np.arange(10, dtype=np.int32)
    for seed in (0, 1, 12345, 2**63 + 17):
        for (w, h) in ((100, 80), (30, 300), (224, 224)):
            crop = np.empty(5, np.int32)
            ops = np.empty(2, np.int32)
            vals = np.empty(2, np.float32)
            lib.dp_sample_params(
                ctypes.c_uint64(seed), w, h, 0.2, 1.0, 0.5,
                cand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                10, 2, 7.0, crop.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            pcrop, pflip, pops, pvals = _py_sample(seed, w, h)
            assert tuple(crop[:4]) == pcrop, (seed, w, h)
            assert crop[4] == pflip
            assert ops.tolist() == pops
            np.testing.assert_allclose(vals, pvals, atol=1e-6)


def test_sampler_crop_always_in_bounds():
    lib = load_dataplane()
    cand = np.arange(10, dtype=np.int32)
    for seed in range(64):
        for (w, h) in ((17, 400), (400, 17), (64, 64)):
            crop = np.empty(5, np.int32)
            ops = np.empty(2, np.int32)
            vals = np.empty(2, np.float32)
            lib.dp_sample_params(
                ctypes.c_uint64(seed), w, h, 0.2, 1.0, 0.5,
                cand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                10, 2, 7.0, crop.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            x0, y0, cw, ch = crop[:4]
            assert 0 < cw <= w and 0 < ch <= h
            assert 0 <= x0 <= w - cw and 0 <= y0 <= h - ch


# ------------------------------------------------------------- end to end

def _jpeg(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def test_transform_batch_shapes_and_broken(rng):
    tf = NativeTrainTransform(32, rng=random.Random(0))
    raws = [_jpeg(_img(rng, 60, 70)), b"garbage", _jpeg(_img(rng, 40, 40))]
    out, ok = tf.transform_batch(raws)
    assert out.shape == (3, 32, 32, 3) and out.dtype == np.uint8
    assert ok.tolist() == [True, False, True]
    assert (out[1] == 0).all() and (out[0] != out[2]).any()


def test_transform_deterministic_per_seed(rng):
    raw = _jpeg(_img(rng, 60, 70))
    a = NativeTrainTransform(32, rng=random.Random(7))(raw)
    b = NativeTrainTransform(32, rng=random.Random(7))(raw)
    c = NativeTrainTransform(32, rng=random.Random(8))(raw)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_end_to_end_matches_pil_given_same_params(rng):
    """Deterministic full-path parity: read the C++ sampler's params for a
    seed, replay them through the PIL ops, compare the pixels. The only
    allowed divergence is the JPEG ROI decode (DCT-scaled, measured
    corr > 0.999 vs exact) plus per-op rounding."""
    lib = load_dataplane()
    names = {v: k for k, v in AUG_OP_IDS.items()}
    # photo-like smooth content: the ROI decode is DCT-scaled, which is a
    # different (equally valid) antialias than PIL's — on white noise the
    # two decorrelate by construction, on photos they agree
    h, w = 180, 220
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(np.stack([xx / w * 255, yy / h * 255,
                             (xx + yy) / (w + h) * 255], -1)
                   + rng.standard_normal((h, w, 3)) * 8, 0,
                   255).astype(np.uint8)
    raw = _jpeg(base)
    img = Image.open(io.BytesIO(raw)).convert("RGB")
    cand = np.arange(10, dtype=np.int32)
    for seed in range(8):
        tf = NativeTrainTransform(64, rng=random.Random(0))
        tf.rng = type("R", (), {"getrandbits": lambda self, _: seed})()
        native = tf(raw).astype(np.float32)

        crop = np.empty(5, np.int32)
        ops = np.empty(2, np.int32)
        vals = np.empty(2, np.float32)
        lib.dp_sample_params(
            ctypes.c_uint64(seed), img.size[0], img.size[1], 0.2, 1.0, 0.5,
            cand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            10, 2, 7.0, crop.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        x0, y0, cw, ch, flip = (int(v) for v in crop)
        ref = img.crop((x0, y0, x0 + cw, y0 + ch)).resize((64, 64),
                                                          Image.BICUBIC)
        if flip:
            ref = T.hflip(ref)
        for op, v in zip(ops.tolist(), vals.tolist()):
            ref = T._AUG_OPS[names[op]][0](ref, v)
        ref = np.asarray(ref, np.float32)
        corr = np.corrcoef(native.ravel(), ref.ravel())[0, 1]
        has_affine = any(op >= 5 for op in ops.tolist())
        # affine-op rounding moves whole pixels; correlation still pins it
        assert corr > (0.97 if has_affine else 0.995), (seed, corr)
        if not has_affine:
            assert np.abs(native - ref).mean() < 3.0, seed


def test_stream_uses_bytes_fast_path(rng, tmp_path):
    """ImageTextStream feeds raw bytes to wants_bytes transforms."""
    import base64 as b64
    import json

    from transformers import BertTokenizerFast

    from x2vlm_tpu.data.pretrain import ImageTextStream
    from x2vlm_tpu.data.streaming import DistLineReader
    from x2vlm_tpu.data.tokenization import TextPreprocessor

    path = tmp_path / "data.jsonl"
    with open(path, "w") as f:
        for i in range(3):
            f.write(json.dumps({
                "binary": b64.b64encode(_jpeg(_img(rng, 50, 50))).decode(),
                "desc": f"a tiny test image {i}"}) + "\n")
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] a tiny test image 0 1 2".split()
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"),
                            do_lower_case=True)
    pre = TextPreprocessor(tok, max_tokens=12, max_masks=3)
    reader = DistLineReader([str(path)], rank=0, world_size=1, repeat=False)
    stream = ImageTextStream(reader, pre,
                             NativeTrainTransform(32, rng=random.Random(0)),
                             image_key="binary", caption_key="desc")
    samples = list(stream)
    assert len(samples) == 3 and stream.broken == 0
    for s in samples:
        assert s["image"].shape == (32, 32, 3)
        assert s["image"].dtype == np.uint8


def test_stream_chunking_is_invisible(rng, tmp_path):
    """Chunked native iteration (C++ pool) yields bit-identical samples to
    per-sample calls for the same transform seed stream, and a broken image
    mid-chunk only bumps the broken counter."""
    import base64 as b64
    import json

    from transformers import BertTokenizerFast

    from x2vlm_tpu.data.pretrain import ImageTextStream
    from x2vlm_tpu.data.streaming import DistLineReader
    from x2vlm_tpu.data.tokenization import TextPreprocessor

    path = tmp_path / "data.jsonl"
    rows = []
    for i in range(7):
        enc = (b"broken!" if i == 3
               else _jpeg(_img(np.random.default_rng(i), 50, 60)))
        rows.append({"binary": b64.b64encode(enc).decode(),
                     "desc": "a tiny test image"})
    with open(path, "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] a tiny test image".split()
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"),
                            do_lower_case=True)

    def run(num_threads):
        pre = TextPreprocessor(tok, max_tokens=12, max_masks=3,
                               rng=random.Random(0))
        reader = DistLineReader([str(path)], rank=0, world_size=1,
                                repeat=False)
        tf = NativeTrainTransform(32, rng=random.Random(5),
                                  num_threads=num_threads)
        s = ImageTextStream(reader, pre, tf, image_key="binary",
                            caption_key="desc")
        return list(s), s.broken

    a, broken_a = run(1)   # chunk = 4 → flushes of 4 and 3
    b, broken_b = run(4)   # chunk = 16 → one flush of 7
    assert broken_a == broken_b == 1
    assert len(a) == len(b) == 6
    for sa, sb in zip(a, b):
        np.testing.assert_array_equal(sa["image"], sb["image"])
        np.testing.assert_array_equal(sa["text_ids_masked"],
                                      sb["text_ids_masked"])


def test_region_pixels_match_pil_given_params(rng):
    """NativeBoxTransform pixel path vs the PIL region path (crop → flip →
    bicubic resize → photometric augs) with pinned parameters."""
    from x2vlm_tpu.data.native import NativeBoxTransform

    h, w = 150, 190
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(np.stack([xx / w * 255, yy / h * 255,
                             (xx + yy) / (w + h) * 255], -1)
                   + rng.standard_normal((h, w, 3)) * 8, 0,
                   255).astype(np.uint8)
    raw = _jpeg(base)
    img = Image.open(io.BytesIO(raw)).convert("RGB")
    tf = NativeBoxTransform(48, rng=random.Random(0))
    assert tf.image_dims(raw) == (w, h)
    for box, flip, aug in (((10, 20, 120, 100), 0, "AutoContrast"),
                           ((0, 0, 190, 150), 1, "Brightness"),
                           ((33, 7, 60, 90), 1, "Equalize")):
        tf.augs = [aug]  # pin the op choice
        tf.n = 1
        native, ok = tf.region_batch([raw], [box], [flip])
        assert ok[0]
        x0, y0, cw, ch = box
        ref = img.crop((x0, y0, x0 + cw, y0 + ch))
        if flip:
            ref = T.hflip(ref)
        ref = ref.resize((48, 48), Image.BICUBIC)
        fn, lo, hi = T._AUG_OPS[aug]
        ref = np.asarray(fn(ref, lo + (hi - lo) * 0.7), np.float32)
        out = native[0].astype(np.float32)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.995, (box, flip, aug, corr)
        assert np.abs(out - ref).mean() < 4.0, (box, flip, aug)


def test_region_stream_native_metadata_matches_pil(rng, tmp_path):
    """Same stream rng → identical bbox/atts/text metadata on both the
    native and PIL region paths (only the image dtype/pixels differ)."""
    import base64 as b64
    import json

    from transformers import BertTokenizerFast

    from x2vlm_tpu.data.native import NativeBoxTransform
    from x2vlm_tpu.data.pretrain import RegionTextStream
    from x2vlm_tpu.data.streaming import DistLineReader
    from x2vlm_tpu.data.tokenization import TextPreprocessor

    path = tmp_path / "regions.jsonl"
    with open(path, "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "binary": b64.b64encode(_jpeg(_img(rng, 96, 112))).decode(),
                "caption": "a tiny test image",
                "elems": [
                    {"bb": [8, 8, 48, 40], "caption": "a tiny image"},
                    {"bb": [30, 20, 60, 60], "caption": "a test image"},
                ]}) + "\n")
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] a tiny test image".split()
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"),
                            do_lower_case=True)

    def run(native):
        pre = TextPreprocessor(tok, max_tokens=12, max_masks=3,
                               rng=random.Random(0))
        reader = DistLineReader([str(path)], rank=0, world_size=1,
                                repeat=False)
        tf = (NativeBoxTransform(32, rng=random.Random(9)) if native
              else T.box_transform(rng=random.Random(9)))
        s = RegionTextStream(reader, pre, tf, image_res=32, patch_size=16,
                             max_regions=3, min_perc_in_image=0.3,
                             rng=random.Random(4))
        return list(s), s.broken

    a, broken_a = run(True)
    b, broken_b = run(False)
    assert broken_a == broken_b == 0 and len(a) == len(b) == 4
    for sa, sb in zip(a, b):
        assert sa["image"].dtype == np.uint8
        assert sb["image"].dtype == np.float32
        assert sa["image"].shape == sb["image"].shape == (32, 32, 3)
        assert len(sa["rows"]) == len(sb["rows"])
        for ra, rb in zip(sa["rows"], sb["rows"]):
            for k in ("target_bbox", "image_atts", "is_image", "text_ids",
                      "text_ids_masked"):
                np.testing.assert_array_equal(ra[k], rb[k], err_msg=k)


def test_video_stream_native_path(rng, tmp_path):
    """VideoTextStream transforms all sampled frames in one native call."""
    import base64 as b64
    import json

    from transformers import BertTokenizerFast

    from x2vlm_tpu.data.pretrain import VideoTextStream
    from x2vlm_tpu.data.streaming import DistLineReader
    from x2vlm_tpu.data.tokenization import TextPreprocessor

    path = tmp_path / "videos.jsonl"
    with open(path, "w") as f:
        for i in range(2):
            frames = [b64.b64encode(_jpeg(_img(rng, 40, 50))).decode()
                      for _ in range(5)]
            f.write(json.dumps({"frames": frames,
                                "caption": "a tiny test image"}) + "\n")
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] a tiny test image".split()
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"),
                            do_lower_case=True)
    pre = TextPreprocessor(tok, max_tokens=12, max_masks=3,
                           rng=random.Random(0))
    reader = DistLineReader([str(path)], rank=0, world_size=1, repeat=False)
    stream = VideoTextStream(reader, pre,
                             NativeTrainTransform(32, rng=random.Random(0)),
                             frame_len=3, rng=random.Random(1))
    samples = list(stream)
    assert len(samples) == 2 and stream.broken == 0
    assert samples[0]["image"].shape == (3, 32, 32, 3)
    assert samples[0]["image"].dtype == np.uint8
