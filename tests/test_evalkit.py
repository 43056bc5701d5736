import math

import numpy as np
import pytest

from x2vlm_tpu.evalkit import (
    bleu, caption_eval, cider_d, exact_match_accuracy, grounding_eval_bbox,
    iou_xyxy, normalize_answer, vqa_accuracy, vqa_eval,
)


def test_normalize_answer():
    assert normalize_answer("A Dog.") == "dog"
    assert normalize_answer("two") == "2"
    assert normalize_answer("isnt") == "isn't"
    assert normalize_answer("the cat") == "cat"


def test_vqa_accuracy_protocol():
    # 10 humans, 4 say "dog": each leave-one-out subset has 3 or 4 matches
    gts = ["dog"] * 4 + ["cat"] * 6
    acc = vqa_accuracy("dog", gts)
    # leaving out a "dog": 3 matches → 1.0 (x4); leaving out a "cat": 4 → 1.0
    assert acc == pytest.approx(1.0)
    gts = ["dog"] * 2 + ["cat"] * 8
    acc = vqa_accuracy("dog", gts)
    # leave-out-dog: 1 match → 1/3 (x2); leave-out-cat: 2 → 2/3 (x8)
    assert acc == pytest.approx((2 * (1 / 3) + 8 * (2 / 3)) / 10)


def test_vqa_eval_and_exact_match():
    res = [{"question_id": 1, "answer": "Two"},
           {"question_id": 2, "answer": "blue"}]
    anns = {1: ["2"] * 10, 2: ["red"] * 10}
    out = vqa_eval(res, anns)
    assert out["overall"] == pytest.approx(50.0)
    assert exact_match_accuracy(res, {1: "Two", 2: "red"}) == 50.0


def test_iou_and_grounding_eval():
    assert iou_xyxy([0, 0, 2, 2], [1, 1, 3, 3]) == pytest.approx(1 / 7)
    refs = {
        7: {"split": "testA", "bbox": [10, 10, 20, 20], "width": 100, "height": 100},
        8: {"split": "val", "bbox": [0, 0, 50, 50], "width": 100, "height": 100},
    }
    results = [
        {"ref_id": 7, "pred": [0.2, 0.2, 0.2, 0.2]},   # exact box
        {"ref_id": 8, "pred": [0.9, 0.9, 0.1, 0.1]},   # way off
    ]
    out = grounding_eval_bbox(results, refs)
    assert out["testA_acc"] == 100.0
    assert out["val_acc"] == 0.0


def test_bleu_perfect_and_partial():
    out = bleu(["the cat sat on the mat"], [["the cat sat on the mat"]])
    assert out["bleu4"] == pytest.approx(1.0)
    out = bleu(["the cat"], [["the dog"]])
    assert out["bleu1"] == pytest.approx(0.5)


def test_cider_identical_beats_different():
    preds_good = ["a dog runs in the park", "a cat sleeps on the couch"]
    refs = [["a dog runs in the park"], ["a cat sleeps on the couch"]]
    good = cider_d(preds_good, refs)
    bad = cider_d(["completely unrelated words here now", "other random tokens appear too"], refs)
    assert good > bad
    assert good > 0


def test_caption_eval_shapes():
    preds = [{"image_id": 1, "caption": "A dog runs"}]
    anns = {1: ["a dog runs", "dog running fast"]}
    out = caption_eval(preds, anns)
    assert set(out) >= {"bleu1", "bleu4", "cider", "meteor", "rouge_l", "n"}
    assert out["n"] == 1


def test_porter_stem_canonical():
    # spot checks against the canonical Porter voc/output pairs
    from x2vlm_tpu.evalkit import porter_stem

    for word, want in [("caresses", "caress"), ("ponies", "poni"),
                       ("motoring", "motor"), ("hopping", "hop"),
                       ("relational", "relat"), ("electriciti", "electr"),
                       ("adjustable", "adjust"), ("formative", "form"),
                       ("sensibiliti", "sensibl"), ("controll", "control"),
                       ("rate", "rate"), ("cease", "ceas")]:
        assert porter_stem(word) == want, word


def test_rouge_l_pycocoevalcap_formula():
    from x2vlm_tpu.evalkit import rouge_l

    # P = 2/2, R = 2/6, beta=1.2 → F = (1+1.44)·P·R / (R + 1.44·P)
    got = rouge_l(["the cat"], [["the cat sat on the mat"]])
    p, r, b2 = 1.0, 2 / 6, 1.2 ** 2
    assert got == pytest.approx((1 + b2) * p * r / (r + b2 * p))
    assert rouge_l(["a b c"], [["a b c"]]) == pytest.approx(1.0)
    # max over references
    assert rouge_l(["x y"], [["q q q", "x y"]]) == pytest.approx(1.0)


def test_meteor_alignment_and_penalty():
    from x2vlm_tpu.evalkit import meteor

    assert meteor(["the cat sat on the mat"],
                  [["the cat sat on the mat"]]) == pytest.approx(1.0)
    # scrambled word order: same unigram matches, fragmentation penalty bites
    ordered = meteor(["the cat sat"], [["the cat sat"]])
    scrambled = meteor(["sat the cat"], [["the cat sat"]])
    assert scrambled < ordered
    # stem stage matches morphological variants ('runs' ~ 'running')
    stemmed = meteor(["a dog runs"], [["a dog running"]])
    unrelated = meteor(["a dog runs"], [["a dog barked"]])
    assert stemmed > unrelated > 0.0
    assert meteor(["x y z"], [["p q r"]]) == 0.0


def test_rle_decode_uncompressed():
    from x2vlm_tpu.evalkit.refer import rle_decode

    # 3x3, column-major: 2 zeros, 3 ones, 4 zeros
    m = rle_decode({"size": [3, 3], "counts": [2, 3, 4]})
    expect = np.zeros((3, 3), np.uint8)
    flat = np.zeros(9, np.uint8)
    flat[2:5] = 1
    expect = flat.reshape(3, 3).T
    np.testing.assert_array_equal(m, expect)
    assert m.sum() == 3


def test_rle_roundtrip_compressed():
    from x2vlm_tpu.evalkit.refer import _decode_rle_string, rle_decode

    def encode(counts):
        # pycocotools rleToString (delta + 6-bit varint)
        s = []
        for i, c in enumerate(counts):
            x = int(c)
            if i > 2:
                x -= int(counts[i - 2])
            more = True
            while more:
                ch = x & 0x1F
                x >>= 5
                more = not ((x == 0 and not (ch & 0x10)) or
                            (x == -1 and (ch & 0x10)))
                if more:
                    ch |= 0x20
                s.append(chr(48 + ch))
        return "".join(s)

    counts = [7, 4, 12, 2, 5, 10]
    assert _decode_rle_string(encode(counts)) == counts
    m1 = rle_decode({"size": [5, 8], "counts": counts})
    m2 = rle_decode({"size": [5, 8], "counts": encode(counts)})
    np.testing.assert_array_equal(m1, m2)


def test_grounding_eval_mask():
    from x2vlm_tpu.evalkit.refer import grounding_eval_mask, mask_iou

    # 10x10 mask: object occupies rows 2-5, cols 2-5 (column-major counts)
    gt = np.zeros((10, 10), np.uint8)
    gt[2:6, 2:6] = 1
    # build counts column-major
    flat = gt.T.reshape(-1)
    counts, cur, val = [], 0, 0
    for v in flat:
        if v == val:
            cur += 1
        else:
            counts.append(cur)
            cur, val = 1, v
    counts.append(cur)
    refs = {1: {"split": "val", "rle": {"size": [10, 10], "counts": counts},
                "width": 10, "height": 10}}
    good = [{"ref_id": 1, "pred": [0.4, 0.4, 0.4, 0.4]}]  # box [2,2,6,6]
    bad = [{"ref_id": 1, "pred": [0.9, 0.9, 0.1, 0.1]}]
    assert grounding_eval_mask(good, refs)["val_acc"] == 100.0
    assert grounding_eval_mask(bad, refs)["val_acc"] == 0.0
    assert mask_iou(gt, gt) == 1.0


def test_grounding_eval_bbox_vlue_hand_computed(tmp_path):
    """2-sample fixture (reference dataset/utils.py:403-437): sample 0's pred
    overlaps the gt exactly (IoU 1.0 >= 0.5), sample 1 is disjoint."""
    import json

    from x2vlm_tpu.evalkit import grounding_eval_bbox_vlue

    anns = [{"ref_id": 1, "bbox": [10, 10, 20, 20], "width": 100,
             "height": 100},
            {"ref_id": 2, "bbox": [0, 0, 10, 10], "width": 100,
             "height": 100}]
    p = tmp_path / "vlue_test.json"
    p.write_text(json.dumps(anns))
    # preds are normalized cxcywh: ref 1 → exactly the gt box; ref 2 → far
    results = [{"ref_id": 1, "pred": [0.20, 0.20, 0.20, 0.20]},
               {"ref_id": 2, "pred": [0.80, 0.80, 0.10, 0.10]}]
    out = grounding_eval_bbox_vlue(results, str(p))
    assert out == {"score": 0.5}


def test_vlue_bicubic_matches_torch():
    """_resize_bicubic must reproduce torch F.interpolate(mode='bicubic',
    align_corners=False), which the reference uses (utils.py:336)."""
    import torch
    import torch.nn.functional as F

    from x2vlm_tpu.evalkit.grounding import _resize_bicubic

    rng = np.random.default_rng(0)
    m = rng.standard_normal((24, 24))
    got = _resize_bicubic(m, 37, 53)
    want = F.interpolate(torch.tensor(m).view(1, 1, 24, 24), size=(37, 53),
                         mode="bicubic").squeeze().numpy()
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_grounding_eval_vlue_mask_scoring(tmp_path):
    """Mask variant (reference dataset/utils.py:318-360): the detection box
    with the highest sum(mask)/area**alpha wins; IoU(ref, winner) >= 0.5
    counts. A mask concentrated inside det A must pick A over the bigger B."""
    import json

    from x2vlm_tpu.evalkit import grounding_eval_vlue

    anns = [{"ref_id": 7, "bbox": [0, 0, 24, 24], "width": 48, "height": 48,
             "dets": [[0, 0, 24, 24], [0, 0, 48, 48]]},
            {"ref_id": 8, "bbox": [24, 24, 24, 24], "width": 48, "height": 48,
             "dets": [[0, 0, 24, 24], [0, 0, 48, 48]]}]
    p = tmp_path / "vlue_test.json"
    p.write_text(json.dumps(anns))
    # mask: all the mass in the top-left quadrant (of the 24×24 grid)
    mask = np.zeros((24, 24))
    mask[:12, :12] = 1.0
    results = [{"ref_id": 7, "pred": mask}, {"ref_id": 8, "pred": mask}]
    # alpha=1: top-left det scores ~sum/576, full-image ~sum/2304 → top-left
    # wins both; it matches ref 7 (IoU 1.0) and misses ref 8 (IoU 0)
    out = grounding_eval_vlue(results, str(p), alpha=1.0, mask_size=24)
    assert out == {"score": 0.5}
