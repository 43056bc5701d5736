"""Host input-pipeline throughput: can this host feed the measured device
step rate? (BASELINE north-star is a *throughput* target; the device-only
step time means nothing if the host can't deliver batches at that rate.)

Measures images/s per stage at 224px on synthetic ~VGA JPEGs (the COCO/CC
shape class), then the full pretrain stream end-to-end, then the overlap a
background Prefetcher achieves against an emulated device step.

Run:  python tools/bench_input_pipeline.py [--n 512] [--res 224]
Prints one JSON line; human-readable breakdown on stderr.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import random
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x2vlm_tpu.data import DistLineReader, Prefetcher, TextPreprocessor, iter_batches
from x2vlm_tpu.data import transforms as T
from x2vlm_tpu.data.pretrain import ImageTextStream


def synth_jpeg_b64(rng, w=500, h=375, quality=80) -> str:
    """Photo-like content (smooth gradients + low-frequency noise) so the
    JPEG size/entropy is realistic (~25-50 KB), not noise-inflated."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (np.stack([xx / w, yy / h, (xx + yy) / (w + h)], -1) * 255)
    low = rng.standard_normal((h // 16 + 1, w // 16 + 1, 3)) * 40
    low = np.asarray(Image.fromarray(
        np.clip(low + 128, 0, 255).astype(np.uint8)).resize((w, h)))
    img = np.clip(0.7 * base + 0.3 * low, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return base64.b64encode(buf.getvalue()).decode()


def rate(fn, n_items, *, min_s=1.0):
    """items/s of fn() (which processes n_items), best of 2 after warmup."""
    fn()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < min_s:
            fn()
            reps += 1
        best = max(best, reps * n_items / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--step_ms", type=float, default=109.3,
                    help="measured device step time to feed (base pretrain)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"generating {args.n} synthetic JPEGs...", file=sys.stderr)
    b64s = [synth_jpeg_b64(rng) for _ in range(min(args.n, 64))]
    b64s = (b64s * (args.n // len(b64s) + 1))[: args.n]
    jpeg_kb = np.mean([len(base64.b64decode(s)) for s in b64s]) / 1024

    tmp = tempfile.mkdtemp(prefix="pipebench_")
    shard = os.path.join(tmp, "shard.jsonl")
    with open(shard, "w") as f:
        for i, s in enumerate(b64s):
            f.write(json.dumps({"binary": s,
                                "desc": f"a photo of sample {i} on a table"})
                    + "\n")

    out = {"jpeg_kb": round(jpeg_kb, 1)}
    sub = b64s[:64]

    # stage: line read + json parse
    def read_parse():
        r = DistLineReader([shard], shuffle=False, repeat=False)
        for _ in r.iter_json():
            pass
    out["read_parse"] = rate(read_parse, args.n)

    # stage: PIL decode (b64 -> RGB array)
    pils = None

    def decode_pil():
        nonlocal pils
        pils = [Image.open(io.BytesIO(base64.b64decode(s))).convert("RGB")
                for s in sub]
    out["decode_pil"] = rate(decode_pil, len(sub))

    # stage: native batched decode+resize+normalize (C++ threads)
    try:
        from x2vlm_tpu.data.native import NativeDecoder, native_available

        if native_available():
            dec = NativeDecoder(args.res)
            out["decode_resize_norm_native"] = rate(
                lambda: dec.decode_b64(sub), len(sub))
    except Exception as e:  # pragma: no cover
        print(f"native unavailable: {e}", file=sys.stderr)

    # stages: crop / randaugment / normalize on decoded PILs
    decode_pil()
    r = random.Random(0)
    out["random_resized_crop"] = rate(
        lambda: [T.random_resized_crop(p, args.res, rng=r) for p in pils],
        len(pils))
    crops = [T.random_resized_crop(p, args.res, rng=r) for p in pils]
    aug = T.RandomAugment(2, 7, rng=r)
    out["randaugment"] = rate(lambda: [aug(c) for c in crops], len(crops))
    auged = [aug(c) for c in crops]
    out["normalize"] = rate(lambda: [T.normalize(a) for a in auged],
                            len(auged))

    # end-to-end pretrain feed rate (decode + full augment + tokenize+mask
    # + collate), exactly the run_pretrain image stream
    from transformers import BertTokenizerFast

    vocab = os.path.join(tmp, "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join("[PAD] [UNK] [CLS] [SEP] [MASK] a photo of sample "
                          "on table".split()) +
                "\n" + "\n".join(str(i) for i in range(10)))
    tok = BertTokenizerFast(vocab_file=vocab, do_lower_case=True)
    pre = TextPreprocessor(tok, max_tokens=40, max_masks=12,
                           rng=random.Random(0))

    def make_transform(kind):
        if kind == "native":
            from x2vlm_tpu.data.native import NativeTrainTransform

            return NativeTrainTransform(args.res, rng=r)
        return T.pretrain_transform(args.res, rng=r,
                                    as_float=(kind == "float"))

    def stream_batches(kind):
        reader = DistLineReader([shard], shuffle=False, repeat=False)
        s = ImageTextStream(reader, pre, make_transform(kind))
        n = 0
        for _ in iter_batches(iter(s), args.batch):
            n += 1
        return n

    variants = [("float", "e2e_feed_float"), ("uint8", "e2e_feed_pil")]
    try:
        make_transform("native")
        variants.append(("native", "e2e_feed"))
    except Exception:
        variants[-1] = ("uint8", "e2e_feed")  # PIL uint8 is the prod path
    for kind, key in variants:
        t0 = time.perf_counter()
        nb = stream_batches(kind)
        el = time.perf_counter() - t0
        out[key] = nb * args.batch / el

    # region stream: PIL float path vs native uint8 path (pixel work +
    # bbox math + per-region tokenize)
    shard_r = os.path.join(tmp, "regions.jsonl")
    with open(shard_r, "w") as f:
        for i, s in enumerate(b64s):
            f.write(json.dumps({
                "binary": s, "caption": f"a photo of sample {i}",
                "elems": [{"bb": [40, 30, 260, 200],
                           "caption": "a sample on a table"},
                          {"bb": [150, 100, 300, 240],
                           "caption": "a photo of a table"}]}) + "\n")

    def region_rate(native):
        from x2vlm_tpu.data.pretrain import RegionTextStream

        if native:
            from x2vlm_tpu.data.native import NativeBoxTransform

            tf = NativeBoxTransform(args.res, rng=random.Random(0))
        else:
            tf = T.box_transform(rng=random.Random(0))
        reader = DistLineReader([shard_r], shuffle=False, repeat=False)
        s = RegionTextStream(reader, pre, tf, image_res=args.res,
                             patch_size=16, max_regions=3,
                             min_perc_in_image=0.3, rng=random.Random(0))
        t0 = time.perf_counter()
        n = sum(1 for _ in s)
        return n / (time.perf_counter() - t0)

    try:
        out["region_feed_native"] = region_rate(True)
    except Exception as e:  # pragma: no cover
        print(f"native region unavailable: {e}", file=sys.stderr)
    out["region_feed_pil"] = region_rate(False)

    # overlap: Prefetcher feeding an emulated device step (sleep releases
    # the GIL exactly like a jax dispatch wait does)
    def overlapped():
        reader = DistLineReader([shard], shuffle=False, repeat=True)
        s = ImageTextStream(reader, pre, make_transform(variants[-1][0]))
        pf = iter(Prefetcher(iter_batches(iter(s), args.batch), depth=2))
        n_steps = max(2, args.n // args.batch)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            next(pf)
            time.sleep(args.step_ms / 1000)
        return n_steps * args.batch / (time.perf_counter() - t0)
    out["e2e_overlapped_with_step"] = overlapped()

    need = args.batch / (args.step_ms / 1000)
    out["required_for_step"] = need
    out["feed_over_required"] = out["e2e_feed"] / need
    out = {k: (round(v, 1) if isinstance(v, float) else v)
           for k, v in out.items()}
    for k, v in out.items():
        print(f"{k:32s} {v}", file=sys.stderr)
    print(json.dumps({"metric": "pretrain_input_pipeline_imgs_per_sec",
                      "value": out["e2e_feed"], "unit": "img/s/host-core",
                      "vs_required": out["feed_over_required"],
                      "detail": out}))


if __name__ == "__main__":
    main()
