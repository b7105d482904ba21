"""Generate a miniature on-disk dataset fixture (images + sfr-layout
annotations + a small bert vocab) so every driver's REAL data path — dataset
classes, training loops, eval, checkpointing — runs end-to-end without the
actual NLVR2/COCO/VQA downloads.

    python tools/make_fixture.py /tmp/fixture
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

WORDS = ["a", "the", "picture", "of", "cat", "dog", "left", "right", "is",
         "on", "two", "red", "blue", "object", "sitting", "mat", "park",
         "running", "small", "big", "yes", "no", "one", "three", "where",
         "what", "color", "in"]


def make(root: str, n: int = 8, image_size: int = 96):
    img_dir = os.path.join(root, "images")
    ann = os.path.join(root, "annotation")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann, exist_ok=True)
    rng = np.random.RandomState(0)

    def save_img(name):
        arr = (rng.rand(image_size, image_size, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        return name

    def caption(i):
        return f"a picture of {WORDS[4 + i % 6]} number {i} on the {WORDS[6 + i % 2]}"

    # bert vocab: specials + whole words + digits
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
             + ["number"] + [str(d) for d in range(10)]
             + [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"]
             + list("abcdefghijklmnopqrstuvwxyz"))
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")

    # NLVR2
    nlvr = []
    for i in range(n):
        nlvr.append({
            "images": [save_img(f"nlvr_{i}_0.jpg"), save_img(f"nlvr_{i}_1.jpg")],
            "sentence": f"the {WORDS[4 + i % 6]} is on the left",
            "label": "True" if i % 2 else "False",
        })
    for split in ("nlvr_train.json", "nlvr_dev.json", "nlvr_test.json"):
        json.dump(nlvr, open(os.path.join(ann, split), "w"))

    # COCO-Karpathy caption/retrieval (+ flickr aliases)
    train, evals = [], []
    for i in range(n):
        name = save_img(f"coco_{i:04d}.jpg")
        train.append({"image": name, "caption": caption(i),
                      "image_id": f"img{i}"})
        evals.append({"image": name, "caption": [caption(i), caption(i) + " indeed"]})
    json.dump(train, open(os.path.join(ann, "coco_karpathy_train.json"), "w"))
    for split in ("coco_karpathy_val.json", "coco_karpathy_test.json"):
        json.dump(evals, open(os.path.join(ann, split), "w"))
    json.dump(train, open(os.path.join(ann, "flickr30k_train.json"), "w"))
    for split in ("flickr30k_val.json", "flickr30k_test.json"):
        json.dump(evals, open(os.path.join(ann, split), "w"))
    # caption ground truth for the offline scorer
    gt = {str(i): [caption(i)] for i in range(n)}
    json.dump(gt, open(os.path.join(ann, "caption_gt.json"), "w"))

    # VQA
    vqa_train, vqa_test = [], []
    for i in range(n):
        name = save_img(f"vqa_{i:04d}.jpg")
        vqa_train.append({
            "image": name, "dataset": "vqa",
            "question": f"what color is the {WORDS[4 + i % 6]}",
            "answer": ["red", "red", "blue"],
        })
        vqa_test.append({"image": name, "question": "what is this",
                         "question_id": i})
    json.dump(vqa_train, open(os.path.join(ann, "vqa_train.json"), "w"))
    json.dump([], open(os.path.join(ann, "vqa_val.json"), "w"))
    json.dump([], open(os.path.join(ann, "vg_qa.json"), "w"))
    json.dump(vqa_test, open(os.path.join(ann, "vqa_test.json"), "w"))
    json.dump(["red", "blue", "cat", "dog", "yes", "no", "one", "two"],
              open(os.path.join(ann, "answer_list.json"), "w"))

    print(f"fixture at {root}: {n} samples per task, vocab "
          f"{len(vocab)} entries")
    return root


if __name__ == "__main__":
    make(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fixture")
