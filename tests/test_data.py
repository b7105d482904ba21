"""Data layer: tokenizers, text preproc, transforms, loader, datasets."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from madtp_tpu.data.tokenizer_bert import BertWordPieceTokenizer
from madtp_tpu.data.text_utils import pre_caption, pre_question, save_result
from madtp_tpu.data.transforms import eval_transform, train_transform
from madtp_tpu.data.loader import batched_loader, shard_indices

BPE_PATH = "/root/reference/clip/bpe_simple_vocab_16e6.txt.gz"


def test_bert_wordpiece_basic():
    tok = BertWordPieceTokenizer.toy(
        ["a", "picture", "of", "cat", "##s", "play", "##ing", "the"]
    )
    ids = tok.encode("A picture of cats playing!")
    toks = [tok.ids_to_tokens[i] for i in ids]
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    assert "cat" in toks and "##s" in toks and "play" in toks and "##ing" in toks
    assert "[UNK]" in toks  # '!' not in toy vocab

    batch = tok(["a cat", "a picture of cats"], padding="longest")
    assert batch["input_ids"].shape == batch["attention_mask"].shape
    assert batch["attention_mask"][0].sum() < batch["attention_mask"][1].sum()
    # decode strips specials and merges wordpieces
    assert tok.decode(tok.encode("a picture of cats")) == "a picture of cats"


def test_bert_special_tokens_match_reference_ids():
    """[DEC]/[ENC] are appended after the base vocab (reference
    models/blip.py:219-225 -> vocab 30522 + 2 = 30524)."""
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"tok{i}" for i in range(10)]
    )}
    tok = BertWordPieceTokenizer(vocab=vocab)
    assert tok.bos_token_id == len(vocab)      # [DEC]
    assert tok.enc_token_id == len(vocab) + 1  # [ENC]


@pytest.mark.skipif(not os.path.exists(BPE_PATH), reason="bpe vocab not present")
def test_clip_bpe_roundtrip():
    from madtp_tpu.data.tokenizer_clip import ClipBPETokenizer, clip_tokenize

    tok = ClipBPETokenizer(BPE_PATH)
    assert len(tok.encoder) == 49408
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    text = "a photo of a cat sitting on the mat"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    arr = clip_tokenize(tok, [text, "dog"], context_length=77)
    assert arr.shape == (2, 77)
    assert arr[0, 0] == 49406
    eot_pos = int(np.argmax(arr[0]))  # eot is the max id
    assert arr[0, eot_pos] == 49407


def test_pre_caption_and_question():
    # regex semantics from reference data/utils.py:10-44
    assert pre_caption('A man; riding "a horse."') == "a man riding a horse"
    assert pre_question("Where is the cat?") == "where is the cat?"
    assert pre_question("What: is. this!") == "what is this"
    long = " ".join(["word"] * 60)
    assert len(pre_caption(long, 50).split()) == 50


def test_save_result_merges_and_dedups(tmp_path):
    d = str(tmp_path)
    save_result([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], d, "res",
                remove_duplicate="id", rank=0, world_size=1)
    # simulate a second rank writing overlapping results then re-merge
    json.dump([{"id": 2, "v": "b"}, {"id": 3, "v": "c"}],
              open(os.path.join(d, "res_rank1.json"), "w"))
    out = save_result([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], d, "res",
                      remove_duplicate="id", rank=0, world_size=2)
    merged = json.load(open(out))
    assert sorted(r["id"] for r in merged) == [1, 2, 3]


def test_transforms_shapes_and_stats():
    import random

    img = Image.fromarray(
        (np.random.RandomState(0).rand(100, 120, 3) * 255).astype(np.uint8))
    a = eval_transform(img, 64)
    assert a.shape == (3, 64, 64) and a.dtype == np.float32
    t = train_transform(img, 64, random.Random(0))
    assert t.shape == (3, 64, 64)
    # normalization: a mid-gray image maps near (0.5 - mean)/std
    gray = Image.fromarray(np.full((32, 32, 3), 128, np.uint8))
    g = eval_transform(gray, 32)
    expect = (128 / 255 - 0.48145466) / 0.26862954
    assert abs(g[0].mean() - expect) < 1e-4


def test_shard_indices_cover_all():
    for n, shards in [(10, 3), (16, 4), (7, 2)]:
        got = np.concatenate([
            shard_indices(n, shuffle=False, seed=0, epoch=0,
                          num_shards=shards, shard_id=s)
            for s in range(shards)
        ])
        assert set(got.tolist()) == set(range(n))
        lens = {len(shard_indices(n, shuffle=False, seed=0, epoch=0,
                                  num_shards=shards, shard_id=s))
                for s in range(shards)}
        assert len(lens) == 1  # equal shard sizes (padded)


def test_batched_loader_and_nlvr_dataset(tmp_path):
    from madtp_tpu.data.datasets import NLVRDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    ann = []
    for i in range(6):
        for j in (0, 1):
            Image.fromarray(
                np.full((40, 40, 3), 10 * i + j, np.uint8)
            ).save(img_dir / f"{i}_{j}.png")
        ann.append({
            "images": [f"{i}_0.png", f"{i}_1.png"],
            "sentence": f"The object {i} is on the left.",
            "label": "True" if i % 2 else "False",
        })
    json.dump(ann, open(tmp_path / "nlvr_test.json", "w"))

    ds = NLVRDataset(lambda im: eval_transform(im, 32), str(img_dir),
                     str(tmp_path), "test")
    assert len(ds) == 6
    batches = list(batched_loader(ds, 4, num_workers=2))
    assert len(batches) == 2
    im0, im1, sents, labels = batches[0]
    assert im0.shape == (4, 3, 32, 32)
    assert isinstance(sents[0], str) and "left" in sents[0]
    assert labels.tolist() == [0, 1, 0, 1]


def test_factory_nlvr(tmp_path):
    import json as _json

    from madtp_tpu.data.factory import create_dataset, create_loader

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    ann = []
    for i in range(4):
        for j in (0, 1):
            Image.fromarray(
                np.full((40, 40, 3), 10 * i + j, np.uint8)
            ).save(img_dir / f"{i}_{j}.png")
        ann.append({"images": [f"{i}_0.png", f"{i}_1.png"],
                    "sentence": f"thing {i}", "label": "True"})
    for split in ("nlvr_train.json", "nlvr_dev.json", "nlvr_test.json"):
        _json.dump(ann, open(tmp_path / split, "w"))

    config = {"image_size": 32, "image_root": str(img_dir),
              "ann_root": str(tmp_path)}
    train, val, test = create_dataset("nlvr", config)
    loaders = create_loader(
        [train, val, test], batch_size=[2, 2, 2],
        is_trains=[True, False, False], num_workers=0)
    batch = next(iter(loaders[1]()))
    assert batch[0].shape == (2, 3, 32, 32)


def test_on_device_normalization_matches_host():
    import jax.numpy as jnp

    from madtp_tpu.data.transforms import eval_resize_uint8
    from madtp_tpu.ops.layers import normalize_images

    img = Image.fromarray(
        (np.random.RandomState(1).rand(50, 70, 3) * 255).astype(np.uint8))
    host = eval_transform(img, 32)  # fp32 CHW, host-normalized
    u8 = eval_resize_uint8(img, 32)
    dev = np.asarray(normalize_images(jnp.asarray(u8[None])))[0]
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_bert_wordpiece_matches_hf(tmp_path):
    """Our WordPiece must tokenize identically to HF BertTokenizer over the
    same vocab (HF constructs offline from a local vocab file)."""
    transformers = pytest.importorskip("transformers")

    words = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + ["a", "the", "picture", "of", "cat", "dog", "play", "left",
                "right", "number", "un", "##s", "##ing", "##ber", "##ed",
                "##affle", "w", "##1", "##2", "1", "2", "3"]
             + list("abcdefghijklmnopqrstuvwxyz"))
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(words) + "\n")

    hf = transformers.BertTokenizer(str(vocab_path), do_lower_case=True)
    ours = BertWordPieceTokenizer(str(vocab_path))

    texts = [
        "A picture of cats playing!",
        "the DOG plays number 123",
        "unaffled w1 w2 left-right",
        "accented café text",
        "punctuation, everywhere; (truly)...",
        "",
        "supercalifragilistic",
    ]
    for t in texts:
        got = ours.tokenize(t)
        want = hf.tokenize(t)
        assert got == want, (t, got, want)
        enc_ours = ours.encode(t, max_length=16)
        enc_hf = hf.encode(t, truncation=True, max_length=16)
        assert enc_ours == enc_hf, (t, enc_ours, enc_hf)


def test_device_prefetch_preserves_order_and_content():
    from madtp_tpu.data.loader import device_prefetch

    batches = [(np.full((2, 3), i, np.float32), [f"s{i}"]) for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, (arr, txt) in enumerate(out):
        assert float(np.asarray(arr)[0, 0]) == i
        assert txt == [f"s{i}"]


def test_mp_loader_matches_threaded_loader():
    """Process-worker loader (data/mp_loader.py): same shard schedule, same
    batch order, same contents as the threaded loader — including shuffle,
    sharding, shared-memory transport, and mixed array/string columns."""
    import numpy as np

    from madtp_tpu.data.loader import batched_loader
    from madtp_tpu.data.mp_loader import mp_batched_loader

    class DS:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return (np.full((3, 48, 48), i, np.float32), f"cap {i}", i)

    ds = DS()
    for kw in (dict(), dict(shuffle=True, epoch=2),
               dict(num_shards=2, shard_id=1, drop_last=True)):
        ref = list(batched_loader(ds, 4, num_workers=2, **kw))
        got = list(mp_batched_loader(ds, 4, num_workers=2, **kw))
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            assert np.array_equal(a[0], b[0])
            assert list(a[1]) == list(b[1])
            assert np.array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_mp_loader_env_switch(monkeypatch):
    """MADTP_MP_LOADER=1 routes batched_loader through the process loader
    with identical results."""
    import numpy as np

    from madtp_tpu.data.loader import batched_loader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((4, 4), i, np.float32), i)

    ds = DS()
    ref = list(batched_loader(ds, 3, num_workers=2))
    monkeypatch.setenv("MADTP_MP_LOADER", "1")
    got = list(batched_loader(ds, 3, num_workers=2))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert np.array_equal(a[0], b[0])


def test_batch_range_matches_full_schedule_without_decoding_skipped():
    """batch_range=(lo, hi) must yield exactly batches[lo:hi] of the full
    schedule (identical membership/order, for the sharded corpus encode)
    and must NOT touch (decode) any sample outside the range — the whole
    point vs islice over a streaming loader."""
    import numpy as np

    from madtp_tpu.data.loader import batched_loader
    from madtp_tpu.data.mp_loader import mp_batched_loader

    touched = set()

    class DS:
        def __len__(self):
            return 22

        def __getitem__(self, i):
            touched.add(i)
            return (np.full((2, 2), i, np.float32), i)

    ds = DS()
    full = list(batched_loader(ds, 4, num_workers=0))
    touched.clear()
    block = list(batched_loader(ds, 4, num_workers=0, batch_range=(2, 4)))
    assert len(block) == 2
    for a, b in zip(full[2:4], block):
        assert np.array_equal(a[0], b[0])
    assert touched == set(range(8, 16))  # batches 2,3 only

    # process-worker loader: same restriction semantics
    blk_mp = list(mp_batched_loader(ds, 4, num_workers=2,
                                    batch_range=(2, 4)))
    assert len(blk_mp) == 2
    for a, b in zip(block, blk_mp):
        assert np.array_equal(a[0], b[0])

    # shuffled schedules restrict the SAME shuffled order
    full_s = list(batched_loader(ds, 4, num_workers=0, shuffle=True,
                                 epoch=3))
    blk_s = list(batched_loader(ds, 4, num_workers=0, shuffle=True,
                                epoch=3, batch_range=(1, 3)))
    for a, b in zip(full_s[1:3], blk_s):
        assert np.array_equal(a[0], b[0])


def test_probe_loader_tiny_dataset_behavior():
    """Probe-batch robustness (code-review r3): a dataset smaller than the
    probe batch size with drop_last=True yields ZERO batches — the drivers
    therefore pass drop_last=len(ds) >= bs, and cached_probe_batches turns
    a still-empty loader into a clear error instead of a downstream
    IndexError."""
    from madtp_tpu.cli.common import cached_probe_batches

    class DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return (np.full((2, 2), i, np.float32), i)

    ds = DS()
    assert list(batched_loader(ds, 8, num_workers=0, drop_last=True)) == []
    # the driver-side guard: keep the partial batch when it's the only one
    got = cached_probe_batches(
        [None], lambda: batched_loader(ds, 8, num_workers=0,
                                       drop_last=len(ds) >= 8), n=3)
    assert len(got) == 1 and got[0][0].shape[0] == 3
    with pytest.raises(ValueError, match="probe loader yielded no batches"):
        cached_probe_batches(
            [None], lambda: batched_loader(ds, 8, num_workers=0,
                                           drop_last=True), n=3)


def test_batched_loader_propagates_decode_errors():
    """A failing __getitem__ must RAISE in the consumer, not truncate the
    epoch silently (the producer thread's end-of-queue sentinel must not
    masquerade as a clean end)."""
    import pytest

    class BadDataset:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            if i == 7:
                raise ValueError("corrupt image")
            return (np.zeros((2, 2), np.float32), i)

    with pytest.raises(ValueError, match="corrupt image"):
        list(batched_loader(BadDataset(), 4, num_workers=2))
    # num_workers=0 path raises too (direct call)
    with pytest.raises(ValueError, match="corrupt image"):
        list(batched_loader(BadDataset(), 4, num_workers=0))


def test_batched_loader_abandoned_generator_unblocks_producer():
    """Closing the generator early (preemption mid-epoch) must let a
    producer blocked in q.put() exit instead of leaking it with prefetched
    batches pinned."""
    import threading
    import time

    class Ds:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return (np.zeros((4,), np.float32), i)

    before = threading.active_count()
    # prefetch=1 is the hard case: the drain's freed slot is instantly
    # re-filled by the producer's in-flight batch, so its final sentinel
    # put() needs the drain to keep going until the thread exits
    for prefetch in (1, 2, 1, 2, 1):
        it = batched_loader(Ds(), 2, num_workers=2, prefetch=prefetch)
        next(it)
        it.close()  # generator finally: stop + drain
    # give the producer threads a beat to observe stop and exit
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_per_sample_rng_loader_determinism():
    """Augmentation streams derive from (seed, epoch, index): identical
    batches across runs, worker counts, and thread interleavings — a
    shared random.Random gave thread-order-dependent augmentations (the
    flakiness that exposed the CLIP driver prune bug)."""
    from PIL import Image

    from madtp_tpu.data.transforms import PerSampleRng, train_transform

    class Ds:
        def __init__(self, rng):
            self.rng = rng
            self.imgs = [
                Image.fromarray(
                    (np.arange(48 * 48 * 3, dtype=np.uint32) * (i + 3)
                     % 255).astype(np.uint8).reshape(48, 48, 3))
                for i in range(16)
            ]

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return (train_transform(self.imgs[i], 32, self.rng), i)

    def run(num_workers, epoch):
        out = list(batched_loader(Ds(PerSampleRng(7)), 4, shuffle=True,
                                  epoch=epoch, num_workers=num_workers))
        return [b[0] for b in out]

    base = run(0, 0)
    for nw in (2, 4):
        for arr_a, arr_b in zip(base, run(nw, 0)):
            np.testing.assert_array_equal(arr_a, arr_b)
    # same config re-run: identical (the old shared-Random path was not)
    for arr_a, arr_b in zip(run(2, 0), run(2, 0)):
        np.testing.assert_array_equal(arr_a, arr_b)
    # different epoch: different augmentations (streams mix the epoch)
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(base, run(0, 1), strict=False))


def test_per_sample_rng_fallback_outside_ctx():
    """Direct transform calls (tests/tools, no loader ctx) fall back to a
    plain seeded stream."""
    from madtp_tpu.data.transforms import PerSampleRng

    a, b = PerSampleRng(5), PerSampleRng(5)
    assert [a.random() for _ in range(4)] == [b.random() for _ in range(4)]
    assert a.randint(0, 10) == b.randint(0, 10)
    assert a.choices([1, 2, 3], k=2) == b.choices([1, 2, 3], k=2)
