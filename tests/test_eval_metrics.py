"""Eval metrics: itm_eval ranks, BLEU/CIDEr sanity."""

import numpy as np

from madtp_tpu.eval.caption_metrics import bleu4, cider_d, coco_caption_scores
from madtp_tpu.eval.metrics import accuracy, itm_eval, vqa_accuracy


def test_itm_eval_perfect_and_shuffled():
    n = 5
    eye = np.eye(n) * 10.0 - 5.0
    txt2img = {i: i for i in range(n)}
    img2txt = {i: [i] for i in range(n)}
    stats = itm_eval(eye, eye.T, txt2img, img2txt)
    assert stats["txt_r1"] == 100.0 and stats["img_r1"] == 100.0
    assert stats["r_mean"] == 100.0

    # anti-diagonal scores -> correct text never at rank 1 (n>1)
    anti = np.fliplr(eye)
    stats2 = itm_eval(anti, anti.T, txt2img, img2txt)
    assert stats2["txt_r1"] < 100.0


def test_accuracy_and_vqa():
    logits = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    assert accuracy(logits, np.array([1, 0, 0])) == 2 / 3
    assert vqa_accuracy(["cat", "dog"], [["cat", "cat", "cat"], ["fish"] * 10]) == 0.5


def test_bleu_perfect_match():
    refs = {"1": ["a man riding a horse on the beach"],
            "2": ["two dogs playing in the snow"]}
    cands = ["a man riding a horse on the beach",
             "two dogs playing in the snow"]
    assert abs(bleu4(cands, refs, ["1", "2"]) - 1.0) < 1e-9
    worse = ["a man on the beach", "dogs in snow maybe"]
    assert bleu4(worse, refs, ["1", "2"]) < 0.5


def test_cider_orders_quality():
    refs = {"1": ["a cat sits on the red mat", "the cat is on a mat"],
            "2": ["a dog runs through the park", "the dog is running outside"]}
    good = ["a cat sits on the mat", "a dog runs through the park"]
    bad = ["blue airplane engine noise", "quantum leap over bananas"]
    s_good = cider_d(good, refs, ["1", "2"])
    s_bad = cider_d(bad, refs, ["1", "2"])
    assert s_good > s_bad
    assert s_bad < 1.0

    out = coco_caption_scores(
        [{"image_id": 1, "caption": good[0]}, {"image_id": 2, "caption": good[1]}],
        {"1": refs["1"], "2": refs["2"]},
    )
    assert out["CIDEr"] > 0 and 0 <= out["Bleu_4"] <= 1
