"""Eval metrics: itm_eval ranks, BLEU/CIDEr sanity."""

import numpy as np

from madtp_tpu.eval.caption_metrics import (bleu, bleu4, cider_d,
                                            coco_caption_scores, meteor,
                                            porter_stem, rouge_l)
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


def test_porter_stem_published_examples():
    """Porter (1980) paper examples, one per rule family."""
    cases = {
        "caresses": "caress", "ponies": "poni", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "hopping": "hop",
        "filing": "file", "happy": "happi", "relational": "relat",
        "digitizer": "digit", "vietnamization": "vietnam",
        "triplicate": "triplic", "electriciti": "electr", "hopeful": "hope",
        "allowance": "allow", "replacement": "replac", "adoption": "adopt",
        "activate": "activ", "probate": "probat", "rate": "rate",
        "controll": "control", "roll": "roll",
    }
    for w, want in cases.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_rouge_l_bounds_and_order():
    refs = {"1": ["a man riding a horse on the beach"]}
    perfect = rouge_l(["a man riding a horse on the beach"], refs, ["1"])
    partial = rouge_l(["a man on the beach"], refs, ["1"])
    junk = rouge_l(["quantum banana engine"], refs, ["1"])
    assert abs(perfect - 1.0) < 1e-9
    assert perfect > partial > junk == 0.0


def test_meteor_stem_matching_and_order():
    refs = {"1": ["a dog runs through the park"]}
    perfect = meteor(["a dog runs through the park"], refs, ["1"])
    # stem matches: running~runs -> full credit, same alignment as exact
    stemmy = meteor(["a dog running through the park"], refs, ["1"])
    partial = meteor(["a dog in the park"], refs, ["1"])
    shuffled = meteor(["park the through runs dog a"], refs, ["1"])
    junk = meteor(["quantum banana engine"], refs, ["1"])
    assert abs(perfect - (1.0 - 0.5 * (1 / 6) ** 3)) < 1e-9  # one chunk
    assert abs(stemmy - perfect) < 1e-9
    assert perfect > partial > junk == 0.0
    # fragmentation penalty: same matches, more chunks -> lower score
    assert shuffled < perfect


def test_bleu_ladder_monotone():
    refs = {"1": ["a cat sits on the red mat"]}
    b = bleu(["a cat sits on the mat"], refs, ["1"])
    assert len(b) == 4
    assert all(0.0 <= x <= 1.0 for x in b)
    assert b[0] >= b[1] >= b[2] >= b[3]
    assert abs(b[3] - bleu4(["a cat sits on the mat"], refs, ["1"])) < 1e-12


def test_coco_caption_scores_full_suite_keys():
    refs = {"1": ["a cat sits on the mat"]}
    out = coco_caption_scores([{"image_id": 1, "caption": "a cat on a mat"}],
                              refs)
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR_offline", "ROUGE_L",
              "CIDEr"):
        assert k in out


def test_itm_eval_random_vs_rowwise_oracle():
    """Vectorized itm_eval == naive per-row rank computation on random data."""
    rng = np.random.RandomState(0)
    n_img, n_txt = 17, 5 * 17
    s_i2t = rng.randn(n_img, n_txt)
    s_t2i = rng.randn(n_txt, n_img)
    txt2img = {t: t // 5 for t in range(n_txt)}
    img2txt = {i: list(range(5 * i, 5 * i + 5)) for i in range(n_img)}

    def naive_rank(scores, gts):
        out = []
        for row, gt in zip(scores, gts):
            order = list(np.argsort(-row))
            out.append(min(order.index(g) for g in gt))
        return np.array(out)

    got = itm_eval(s_i2t, s_t2i, txt2img, img2txt)
    txt_rank = naive_rank(s_i2t, [img2txt[i] for i in range(n_img)])
    img_rank = naive_rank(s_t2i, [[txt2img[t]] for t in range(n_txt)])
    for k in (1, 5, 10):
        assert got[f"txt_r{k}"] == 100.0 * np.mean(txt_rank < k)
        assert got[f"img_r{k}"] == 100.0 * np.mean(img_rank < k)
