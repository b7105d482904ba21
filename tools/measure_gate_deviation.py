"""Quantify the caption best-checkpoint gate deviation (VERDICT r2 #8).

The reference gates the best caption checkpoint on ``CIDEr + SPICE``
(/root/reference/compress_caption_dtp.py:303); this repo gates on
CIDEr + SPICE_offline (eval/spice.py — the published tuple-F1 formula
over a clean-room parser; the jar's Stanford parser + WordNet cannot
ship here).  The jar itself cannot run in this environment, so the
residual deviation is quantified structurally: two gates disagree on a
pair of epochs iff the secondary metric's delta opposes and outweighs
the CIDEr delta (|dS| > |dC| with opposite sign).  We measure that
joint delta distribution three ways:
  * CIDEr alone vs CIDEr+SPICE_offline — how much the second metric
    changes decisions at all (it can only act at CIDEr ties);
  * CIDEr+SPICE_offline vs CIDEr+METEOR_offline — substituting a
    DIFFERENT content metric as the secondary; this bounds the
    sensitivity of the gate to which content metric stands in for jar
    SPICE (on COCO leaderboards SPICE and METEOR have near-identical
    magnitude/spread and track each other, so jar-SPICE substitution
    sits inside this envelope);
  * the sequential `metric > best` trajectory gate for both of the
    above.

Protocol (pure CPU, deterministic):
  * 64 synthetic images x 5 templated reference captions.
  * a quality ladder of candidate caption sets: per-token corruption with
    probability (1-q), q in [0.35, 1.0] x 14 — CIDEr spans ~0.2..10.
  * all C(14,2) ladder pairs: flip rate of sign(dC) vs sign(dC + dM).
  * 200 simulated 8-epoch training trajectories (noisy monotone quality,
    epoch-to-epoch jitter matched to the ladder spacing): fraction where
    the sequential `metric > best` gate picks a different best epoch.

Run: python tools/measure_gate_deviation.py   (prints one JSON line)
"""
import itertools
import json
import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np

from madtp_tpu.eval.caption_metrics import coco_caption_scores

NOUNS = ("dog cat man woman child horse bus train boat plate table bench "
         "kite bird pizza clock bear zebra giraffe couch").split()
VERBS = "sitting standing running jumping eating riding holding watching".split()
PLACES = ("on the beach in the park near the water on a street in a field "
          "by the window at the station on the grass").split(" ")
VOCAB = sorted(set(NOUNS + VERBS + "a the with and near on in two".split()))


def _ref_caption(rng):
    n1, n2 = rng.choice(NOUNS, 2, replace=False)
    v = rng.choice(VERBS)
    k = rng.randint(0, len(PLACES) - 3)
    place = " ".join(PLACES[k:k + 3])
    return f"a {n1} {v} with a {n2} {place}"


def make_gt(rng, n_images=64, n_refs=5):
    return {str(i): [_ref_caption(rng) for _ in range(n_refs)]
            for i in range(n_images)}


def corrupt(caption, q, rng):
    toks = caption.split()
    out = []
    for t in toks:
        r = rng.rand()
        if r < (1.0 - q) * 0.7:
            out.append(VOCAB[rng.randint(len(VOCAB))])   # substitute
        elif r < (1.0 - q):
            continue                                      # drop
        else:
            out.append(t)
    return " ".join(out) if out else "a"


def candidate_set(gt, q, rng):
    return [{"image_id": iid, "caption": corrupt(refs[0], q, rng)}
            for iid, refs in gt.items()]


def main():
    rng = np.random.RandomState(0)
    gt = make_gt(rng)
    qs = np.linspace(0.35, 1.0, 14)
    points = []        # one (q, CIDEr, METEOR) per ladder rung (first replica)
    all_points = []    # 4 corruption-draw replicas per rung: same-rung pairs
    for q in qs:       # have tiny metric deltas = converged-epoch jitter
        for rep in range(4):
            scores = coco_caption_scores(candidate_set(gt, q, rng), gt)
            pt = (float(q), scores["CIDEr"], scores["METEOR_offline"],
                  scores["SPICE_offline"])
            all_points.append(pt)
            if rep == 0:
                points.append(pt)

    # pairwise gate-decision flips: CIDEr-only vs CIDEr + secondary,
    # bucketed by how tied the pair is on CIDEr
    bands = [(0.0, 0.01), (0.01, 0.05), (0.05, 0.2), (0.2, np.inf)]
    band_n = [0] * len(bands)
    band_flips = [0] * len(bands)
    n_pairs, flips = 0, 0
    sub_flips = 0   # (C+SPICE_offline) vs (C+METEOR_offline)
    sub_tied = 0    # ... and the pair was CIDEr-tied (<0.05)
    gaps = []
    for (qa, ca, ma, sa), (qb, cb, mb, sb) in \
            itertools.combinations(all_points, 2):
        dc, dm, ds = ca - cb, ma - mb, sa - sb
        n_pairs += 1
        gaps.append(abs(dc))
        flip = np.sign(dc) != np.sign(dc + ds)
        flips += flip
        sflip = np.sign(dc + ds) != np.sign(dc + dm)
        sub_flips += sflip
        sub_tied += sflip and abs(dc) < 0.05
        for i, (lo, hi) in enumerate(bands):
            if lo <= abs(dc) < hi:
                band_n[i] += 1
                band_flips[i] += flip
                break

    # sequential `metric > best` gate over simulated trajectories.  Epochs
    # are (rung, random replica) so converged tails sit at the top rung and
    # differ only by corruption-draw jitter — the near-tied regime where
    # the gates can actually diverge.
    by_rung = {}
    for q, c, m, sp in all_points:
        by_rung.setdefault(round(q, 4), []).append((c, m, sp))
    qkeys = sorted(by_rung)
    traj_rng = np.random.RandomState(1)
    disagree = sub_disagree = 0
    n_traj = 200
    for _ in range(n_traj):
        idx, path = 0, []
        for _ep in range(8):
            idx = int(np.clip(idx + traj_rng.choice([-1, 1, 1, 2]),
                              0, len(qkeys) - 1))
            reps = by_rung[qkeys[idx]]
            path.append(reps[traj_rng.randint(len(reps))])
        def best_epoch(key):
            best, at = -1.0, -1
            for ep, (c, m, sp) in enumerate(path):
                v = {"cider": c, "spice": c + sp, "meteor": c + m}[key]
                if v > best:
                    best, at = v, ep
            return at
        if best_epoch("cider") != best_epoch("spice"):
            disagree += 1
        if best_epoch("spice") != best_epoch("meteor"):
            sub_disagree += 1

    out = {
        "ladder_cider_range": [round(points[0][1], 3),
                               round(points[-1][1], 3)],
        "ladder_meteor_range": [round(points[0][2], 3),
                                round(points[-1][2], 3)],
        "ladder_spice_range": [round(points[0][3], 3),
                               round(points[-1][3], 3)],
        "pairs": n_pairs,
        "pairwise_flip_rate": round(flips / n_pairs, 4),
        "flip_rate_by_cider_gap": {
            f"[{lo},{'inf' if hi is np.inf else hi})":
                [int(band_flips[i]), int(band_n[i])]
            for i, (lo, hi) in enumerate(bands)
        },
        "median_abs_cider_gap": round(float(np.median(gaps)), 4),
        "secondary_substitution_flip_rate": round(sub_flips / n_pairs, 4),
        "secondary_substitution_flips_cider_tied": int(sub_tied),
        "secondary_substitution_flips_total": int(sub_flips),
        "trajectories": n_traj,
        "traj_best_epoch_disagree_rate": round(disagree / n_traj, 4),
        "traj_secondary_substitution_disagree_rate": round(
            sub_disagree / n_traj, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
