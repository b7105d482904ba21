"""Offline caption scorers: corpus BLEU-4 and CIDEr-D.

The reference shells out to pycocoevalcap (Java + downloads,
reference ``data/utils.py:94-123``); this pure-python implementation of the
standard formulas enables local regression scoring in a zero-egress
environment.  (SPICE needs a Java parser and is intentionally out of scope;
the reference's model-selection gate uses CIDEr+SPICE — with this scorer use
CIDEr alone or plug pycocoevalcap when available.)
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu4(candidates: List[str], references: Dict[str, List[str]],
          ids: List[str]) -> float:
    """Corpus BLEU-4 with standard brevity penalty (Papineni et al. 2002)."""
    clipped = [0] * 4
    totals = [0] * 4
    c_len = 0
    r_len = 0
    for cand, key in zip(candidates, ids):
        ct = cand.split()
        refs = [r.split() for r in references[key]]
        c_len += len(ct)
        r_len += min((abs(len(r) - len(ct)), len(r)) for r in refs)[1]
        for n in range(1, 5):
            cg = _ngrams(ct, n)
            best = Counter()
            for r in refs:
                rg = _ngrams(r, n)
                for g, cnt in rg.items():
                    best[g] = max(best[g], cnt)
            totals[n - 1] += max(sum(cg.values()), 0)
            clipped[n - 1] += sum(min(c, best[g]) for g, c in cg.items())
    if 0 in totals or 0 in clipped:
        return 0.0
    logp = sum(math.log(c / t) for c, t in zip(clipped, totals)) / 4.0
    bp = 1.0 if c_len > r_len else math.exp(1.0 - r_len / max(c_len, 1))
    return bp * math.exp(logp)


def cider_d(candidates: List[str], references: Dict[str, List[str]],
            ids: List[str], *, sigma: float = 6.0) -> float:
    """CIDEr-D (Vedantam et al. 2015): tf-idf weighted n-gram cosine with
    count clipping and a gaussian length penalty, averaged over n=1..4,
    scaled by 10."""
    # document frequencies over the reference corpus
    df: Dict[int, Counter] = {n: Counter() for n in range(1, 5)}
    for key in references:
        for n in range(1, 5):
            seen = set()
            for r in references[key]:
                seen |= set(_ngrams(r.split(), n).keys())
            for g in seen:
                df[n][g] += 1
    n_docs = max(len(references), 1)

    def tfidf(counts: Counter, n: int):
        vec = {}
        norm = 0.0
        length = sum(counts.values())
        for g, c in counts.items():
            idf = math.log(max(n_docs, 1)) - math.log(max(df[n][g], 1))
            w = (c / max(length, 1)) * idf
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm), length

    total = 0.0
    for cand, key in zip(candidates, ids):
        ct = cand.split()
        score_n = [0.0] * 4
        for n in range(1, 5):
            cvec, cnorm, clen = tfidf(_ngrams(ct, n), n)
            for r in references[key]:
                rt = r.split()
                rvec, rnorm, rlen = tfidf(_ngrams(rt, n), n)
                num = 0.0
                for g, w in cvec.items():
                    # CIDEr-D clips candidate weight at reference weight
                    num += min(w, rvec.get(g, 0.0)) * rvec.get(g, 0.0)
                denom = cnorm * rnorm
                sim = num / denom if denom > 0 else 0.0
                delta = len(ct) - len(rt)
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                score_n[n - 1] += sim
            score_n[n - 1] /= max(len(references[key]), 1)
        total += 10.0 * sum(score_n) / 4.0
    return total / max(len(candidates), 1)


def coco_caption_scores(results: List[dict], gt: Dict[str, List[str]]):
    """``results``: [{'image_id', 'caption'}]; ``gt``: image_id -> refs."""
    ids = [str(r["image_id"]) for r in results if str(r["image_id"]) in gt]
    cands = [r["caption"] for r in results if str(r["image_id"]) in gt]
    refs = {k: gt[k] for k in ids}
    return {
        "Bleu_4": bleu4(cands, refs, ids),
        "CIDEr": cider_d(cands, refs, ids),
    }
