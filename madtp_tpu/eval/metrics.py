"""Task metrics (reference ``compress_retrieval_dtp.py:209-254`` itm_eval,
``compress_nlvr_dtp.py:88-91`` accuracy)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def itm_eval(
    scores_i2t: np.ndarray,  # [n_images, n_texts]
    scores_t2i: np.ndarray,  # [n_texts, n_images]
    txt2img: Sequence[int],
    img2txt: Sequence[Sequence[int]],
) -> Dict[str, float]:
    """Recall@{1,5,10} both directions + means
    (reference compress_retrieval_dtp.py:209-254)."""
    ranks = np.zeros(scores_i2t.shape[0])
    for index, score in enumerate(scores_i2t):
        inds = np.argsort(score)[::-1]
        rank = 1e20
        for i in img2txt[index]:
            tmp = np.where(inds == i)[0][0]
            if tmp < rank:
                rank = tmp
        ranks[index] = rank

    tr1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    tr5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    tr10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)

    ranks = np.zeros(scores_t2i.shape[0])
    for index, score in enumerate(scores_t2i):
        inds = np.argsort(score)[::-1]
        ranks[index] = np.where(inds == txt2img[index])[0][0]

    ir1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    ir5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    ir10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)

    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    r_mean = (tr_mean + ir_mean) / 2
    return {
        "txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10,
        "img_r1": ir1, "img_r5": ir5, "img_r10": ir10,
        "txt_r_mean": tr_mean, "img_r_mean": ir_mean, "r_mean": r_mean,
    }


def accuracy(logits: np.ndarray, targets: np.ndarray) -> float:
    """Classification accuracy (reference compress_nlvr_dtp.py:88-91)."""
    return float((logits.argmax(-1) == targets).mean())


def vqa_accuracy(preds: List[str], answers_list: List[List[str]]) -> float:
    """VQAv2-style soft accuracy: min(#matching humans / 3, 1) averaged.
    (The reference submits to the eval.ai server, README.md:114; this local
    scorer enables offline regression testing.)"""
    total = 0.0
    for pred, answers in zip(preds, answers_list):
        matches = sum(1 for a in answers if a == pred)
        total += min(matches / 3.0, 1.0)
    return total / max(len(preds), 1)
