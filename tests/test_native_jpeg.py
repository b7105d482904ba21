"""Native (C++) JPEG fast path vs the PIL pipeline.

madtp_tpu/native fuses decode -> crop -> Pillow-bicubic resize ->
normalize in one GIL-free libjpeg-turbo call.  MADTP_NATIVE_JPEG=1 must be
BIT-EXACT against the PIL transforms (same libjpeg decode, same resampling
math); =2 (DCT-scaled decode) is tolerance-bounded.  The PIL path itself is
pinned by test_data.py's transform tests.
"""

import io
import os
import random

import numpy as np
import pytest
from PIL import Image

from madtp_tpu import native
from madtp_tpu.data.transforms import (
    eval_resize_uint8, eval_transform, train_transform,
)

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native jpeg helper unavailable (no g++/libjpeg)")


def _photo(w=500, h=420, seed=0):
    rng = np.random.RandomState(seed)
    gx = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    gy = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    img = np.stack([gx, gy, (gx + gy) / 2], -1).astype(np.uint8)
    return img + (rng.rand(h, w, 3) * 40).astype(np.uint8)


def _save(tmp_path, arr, name="img.jpg", **kw):
    p = str(tmp_path / name)
    Image.fromarray(arr).save(p, "JPEG", quality=92, **kw)
    return p


def test_decode_resize_bitexact_vs_pil(tmp_path):
    p = _save(tmp_path, _photo())
    data = open(p, "rb").read()
    pil = Image.open(p).convert("RGB")
    for size in (384, 128):
        ref = np.asarray(pil.resize((size, size), Image.BICUBIC), np.uint8)
        got = native.decode_resize(data, size, dct_scale=False)
        assert np.array_equal(ref, got), f"size {size}"
    # crop boxes incl. edges
    for box in [(0, 0, 100, 100), (37, 81, 301, 233), (399, 319, 101, 101)]:
        x, y, w, h = box
        ref = np.asarray(pil.crop((x, y, x + w, y + h))
                         .resize((64, 64), Image.BICUBIC), np.uint8)
        got = native.decode_resize(data, 64, crop=box, dct_scale=False)
        assert np.array_equal(ref, got), f"crop {box}"


def test_decode_variants(tmp_path):
    img = _photo()
    # grayscale source -> replicated RGB like PIL convert
    pg = str(tmp_path / "g.jpg")
    Image.fromarray(img[:, :, 0]).save(pg, "JPEG", quality=92)
    ref = np.asarray(Image.open(pg).convert("RGB").resize(
        (64, 64), Image.BICUBIC), np.uint8)
    got = native.decode_resize(open(pg, "rb").read(), 64, dct_scale=False)
    assert np.array_equal(ref, got)
    # progressive
    pp = _save(tmp_path, img, "p.jpg", progressive=True)
    ref = np.asarray(Image.open(pp).convert("RGB").resize(
        (96, 96), Image.BICUBIC), np.uint8)
    got = native.decode_resize(open(pp, "rb").read(), 96, dct_scale=False)
    assert np.array_equal(ref, got)
    # upscale from a tiny image (support stays 2, no antialias widening)
    pt = _save(tmp_path, img[:40, :50], "t.jpg")
    ref = np.asarray(Image.open(pt).convert("RGB").resize(
        (128, 128), Image.BICUBIC), np.uint8)
    got = native.decode_resize(open(pt, "rb").read(), 128, dct_scale=False)
    assert np.array_equal(ref, got)
    # CMYK -> explicit fallback signal
    pc = str(tmp_path / "c.jpg")
    Image.fromarray(img).convert("CMYK").save(pc, "JPEG", quality=92)
    with pytest.raises(native.UnsupportedJpeg):
        native.decode_resize(open(pc, "rb").read(), 64)
    # dims probe
    assert native.jpeg_dims(open(pg, "rb").read()) == (500, 420)


def test_dct_scaled_decode_bounded(tmp_path):
    """MADTP_NATIVE_JPEG=2 semantics: M/8 DCT-scaled decode never upscales
    and stays within a few uint8 LSB of the full-decode result on a
    noisy synthetic (real photos deviate less)."""
    p = _save(tmp_path, _photo())
    data = open(p, "rb").read()
    ref = native.decode_resize(data, 224, dct_scale=False)
    got = native.decode_resize(data, 224, dct_scale=True)
    d = np.abs(ref.astype(int) - got.astype(int))
    assert d.mean() < 8.0
    # target larger than source/8 in one dim -> must pick a finer scale
    got2 = native.decode_resize(data, (480, 64), dct_scale=True)
    assert got2.shape == (64, 480, 3)


def test_transforms_use_native_when_enabled(tmp_path, monkeypatch):
    p = _save(tmp_path, _photo())
    lazy = Image.open(p)

    monkeypatch.delenv("MADTP_NATIVE_JPEG", raising=False)
    ref_eval = eval_transform(Image.open(p), 384)
    ref_u8 = eval_resize_uint8(Image.open(p), 384)
    ref_train = train_transform(Image.open(p), 224, random.Random(7))

    monkeypatch.setenv("MADTP_NATIVE_JPEG", "1")
    got_eval = eval_transform(lazy, 384)
    got_u8 = eval_resize_uint8(Image.open(p), 384)
    got_train = train_transform(Image.open(p), 224, random.Random(7))

    assert np.array_equal(ref_u8, got_u8)
    np.testing.assert_allclose(got_eval, ref_eval, atol=1e-6)
    # same rng stream -> same crop box, flip, and augment ops; the native
    # decode+crop+resize is bit-exact, so the whole train transform matches
    np.testing.assert_allclose(got_train, ref_train, atol=1e-6)

    monkeypatch.setenv("MADTP_NATIVE_JPEG", "2")
    got2 = eval_transform(Image.open(p), 384)
    assert np.abs(got2 - ref_eval).mean() < 0.15  # DCT-scaled, normalized units

    # non-JPEG input routes through the native resampler, bit-exactly
    png = str(tmp_path / "x.png")
    Image.fromarray(_photo(64, 64)).save(png)
    monkeypatch.delenv("MADTP_NATIVE_JPEG", raising=False)
    ref_png = eval_transform(Image.open(png), 32)
    ref_png_t = train_transform(Image.open(png), 32, random.Random(3))
    monkeypatch.setenv("MADTP_NATIVE_JPEG", "1")
    np.testing.assert_allclose(eval_transform(Image.open(png), 32),
                               ref_png, atol=1e-6)
    np.testing.assert_allclose(
        train_transform(Image.open(png), 32, random.Random(3)),
        ref_png_t, atol=1e-6)


def test_edge_cases(tmp_path):
    rng = np.random.RandomState(0)

    def jbytes(arr, **kw):
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", **kw)
        return b.getvalue()

    # garbage rejected; truncated streams decode soft (libjpeg warning
    # semantics: missing blocks fill gray instead of crashing the loader;
    # note the PIL path would raise here)
    with pytest.raises(native.UnsupportedJpeg):
        native.decode_resize(b"not a jpeg" * 20, 64)
    full = jbytes((rng.rand(400, 400, 3) * 255).astype(np.uint8), quality=92)
    assert native.decode_resize(full[: len(full) // 2], 128).shape == (128, 128, 3)
    # tiny sources stay exact
    for shape in [(1, 1, 3), (1, 8, 3), (8, 1, 3)]:
        d = jbytes((rng.rand(*shape) * 255).astype(np.uint8), quality=92)
        ref = np.asarray(Image.open(io.BytesIO(d)).convert("RGB")
                         .resize((32, 32), Image.BICUBIC))
        assert np.array_equal(ref, native.decode_resize(d, 32, dct_scale=False))
    # all chroma subsampling modes, cropped
    for ss in (0, 1, 2):
        d = jbytes((rng.rand(100, 150, 3) * 255).astype(np.uint8),
                   quality=92, subsampling=ss)
        ref = np.asarray(Image.open(io.BytesIO(d)).convert("RGB")
                         .crop((13, 7, 113, 87)).resize((48, 48), Image.BICUBIC))
        got = native.decode_resize(d, 48, crop=(13, 7, 100, 80),
                                   dct_scale=False)
        assert np.array_equal(ref, got), f"subsampling {ss}"
    # out-of-range crop clamps to the image like PIL's edge crop
    d = jbytes((rng.rand(50, 50, 3) * 255).astype(np.uint8), quality=92)
    ref = np.asarray(Image.open(io.BytesIO(d)).convert("RGB")
                     .crop((40, 40, 50, 50)).resize((32, 32), Image.BICUBIC))
    assert np.array_equal(
        ref, native.decode_resize(d, 32, crop=(40, 40, 100, 100),
                                  dct_scale=False))


def test_raw_resize_matches_pil():
    arr = _photo(300, 220, seed=3)
    pil = Image.fromarray(arr)
    ref = np.asarray(pil.resize((96, 96), Image.BICUBIC), np.uint8)
    assert np.array_equal(ref, native.resize(arr, 96))
    box = (17, 40, 201, 133)
    x, y, w, h = box
    refc = np.asarray(pil.crop((x, y, x + w, y + h))
                      .resize((64, 64), Image.BICUBIC), np.uint8)
    assert np.array_equal(refc, native.resize(arr, 64, crop=box))
    f = native.resize_norm(arr, 96)
    from madtp_tpu.data.transforms import MEAN, STD

    ref_f = ((ref.astype(np.float32) / 255.0 - MEAN) / STD).transpose(2, 0, 1)
    np.testing.assert_allclose(f, ref_f, atol=1e-6)


def test_loader_end_to_end_native_matches_pil(tmp_path, monkeypatch):
    """Dataset -> batched_loader parity with the env toggle on."""
    from madtp_tpu.data.loader import batched_loader

    paths = [_save(tmp_path, _photo(seed=i), f"i{i}.jpg") for i in range(6)]

    class DS:
        def __len__(self):
            return len(paths)

        def __getitem__(self, i):
            return (eval_transform(Image.open(paths[i]), 96), i)

    monkeypatch.delenv("MADTP_NATIVE_JPEG", raising=False)
    ref = [b for b in batched_loader(DS(), 3, num_workers=2)]
    monkeypatch.setenv("MADTP_NATIVE_JPEG", "1")
    got = [b for b in batched_loader(DS(), 3, num_workers=2)]
    assert len(ref) == len(got) == 2
    for (ra, ri), (ga, gi) in zip(ref, got):
        np.testing.assert_allclose(ga, ra, atol=1e-6)
        assert np.array_equal(ri, gi)


def test_mp_loader_with_native_decode(tmp_path, monkeypatch):
    """Process-worker loader (fork) + the native decoder: children inherit
    or rebuild the ctypes lib and must produce the same batches as the
    threaded PIL path."""
    from madtp_tpu.data.mp_loader import mp_batched_loader

    paths = [_save(tmp_path, _photo(seed=i), f"m{i}.jpg") for i in range(4)]

    class DS:
        def __len__(self):
            return len(paths)

        def __getitem__(self, i):
            return (eval_transform(Image.open(paths[i]), 64), i)

    monkeypatch.delenv("MADTP_NATIVE_JPEG", raising=False)
    ref = [b for b in mp_batched_loader(DS(), 2, num_workers=2)]
    monkeypatch.setenv("MADTP_NATIVE_JPEG", "1")
    got = [b for b in mp_batched_loader(DS(), 2, num_workers=2)]
    assert len(ref) == len(got) == 2
    for (ra, ri), (ga, gi) in zip(ref, got):
        np.testing.assert_allclose(ga, ra, atol=1e-6)
        assert np.array_equal(ri, gi)
