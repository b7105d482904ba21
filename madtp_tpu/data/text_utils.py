"""Text preprocessing + distributed result merging
(reference ``data/utils.py:10-86``)."""

from __future__ import annotations

import json
import os
import re
from typing import List


def pre_caption(caption: str, max_words: int = 50) -> str:
    caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
    caption = re.sub(r"\s{2,}", " ", caption)
    caption = caption.rstrip("\n").strip(" ")
    words = caption.split(" ")
    if len(words) > max_words:
        caption = " ".join(words[:max_words])
    return caption


def pre_question(question: str, max_ques_words: int = 50) -> str:
    question = re.sub(r"([.!\"()*#:;~])", "", question.lower())
    question = question.rstrip(" ")
    words = question.split(" ")
    if len(words) > max_ques_words:
        question = " ".join(words[:max_ques_words])
    return question


def save_result(result: List[dict], result_dir: str, filename: str,
                remove_duplicate: str = "", *, rank: int = 0,
                world_size: int = 1, barrier=None) -> str:
    """Per-rank JSON + rank-0 merge/dedup (reference data/utils.py:47-86).
    ``barrier`` is an optional callable for multi-process sync."""
    os.makedirs(result_dir, exist_ok=True)
    result_file = os.path.join(result_dir, f"{filename}_rank{rank}.json")
    final_result_file = os.path.join(result_dir, f"{filename}.json")
    json.dump(result, open(result_file, "w"))
    if barrier is not None:
        barrier()
    if rank == 0:
        merged = []
        for r in range(world_size):
            merged += json.load(open(os.path.join(
                result_dir, f"{filename}_rank{r}.json")))
        if remove_duplicate:
            seen, out = set(), []
            for res in merged:
                if res[remove_duplicate] not in seen:
                    seen.add(res[remove_duplicate])
                    out.append(res)
            merged = out
        json.dump(merged, open(final_result_file, "w"))
    return final_result_file
