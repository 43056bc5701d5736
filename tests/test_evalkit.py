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
    assert set(out) >= {"bleu1", "bleu4", "cider", "n"}
    assert out["n"] == 1
