"""Image preprocessing (reference ``data/__init__.py:20-33`` transforms +
``transform/randaugment.py`` RandAugment, reimplemented on PIL/numpy).

Eval: bicubic resize to (S, S), scale to [0,1], normalize with CLIP stats
(0.48145466, 0.4578275, 0.40821073) / (0.26862954, 0.26130258, 0.27577711),
CHW float32.  Train adds RandomResizedCrop(0.5-1.0, bicubic), horizontal
flip, and RandAugment(2, 5) over the reference's 10-op palette.
"""

from __future__ import annotations

import os
import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


# ---------------------------------------------------------------------------
# Per-sample deterministic augmentation RNG
#
# A single random.Random shared by loader worker THREADS assigns draws to
# samples in thread-interleaving order — two identical runs augment
# differently, so training is not reproducible (the reference has the
# dataloader-worker-count flavor of the same problem: its stream depends on
# which torch worker decodes which sample).  PerSampleRng instead derives an
# independent stream per (seed, epoch, sample index): the loaders declare
# the current sample via sample_ctx() around dataset[i], and every draw in
# that __getitem__ comes from a stream that depends only on those three
# integers — bit-identical across runs, worker counts, thread schedules,
# and thread/process loader choice.

import contextlib
import hashlib
import threading

_SAMPLE_TL = threading.local()


@contextlib.contextmanager
def sample_ctx(epoch: int, index: int):
    """Declare the (epoch, sample index) for dataset[i] fetches on this
    thread; PerSampleRng draws inside derive from it.  Each entry starts a
    FRESH stream even for a repeated (epoch, index) — a re-fetch (resume,
    probe batches) must not depend on whether an earlier fetch of the same
    sample happened to run on this thread."""
    prev = getattr(_SAMPLE_TL, "ctx", None)
    token = getattr(_SAMPLE_TL, "token", 0) + 1
    _SAMPLE_TL.token = token
    _SAMPLE_TL.ctx = (int(epoch), int(index), token)
    try:
        yield
    finally:
        _SAMPLE_TL.ctx = prev


def fetch_with_ctx(dataset, epoch: int, index: int):
    """The one item-fetch wrapper every loader path uses: declares the
    sample ctx so PerSampleRng transforms draw their per-(seed, epoch,
    index) stream.  Shared so the threaded, process, and in-line loader
    paths cannot diverge on the context protocol."""
    with sample_ctx(epoch, index):
        return dataset[int(index)]


def _derived_rng(seed: int, epoch: int, index: int) -> random.Random:
    # blake2b, not hash(): python's hash is salted per process and must not
    # leak into augmentation streams (same reason mp_loader mixes worker
    # seeds arithmetically)
    h = hashlib.blake2b(f"{seed}/{epoch}/{index}".encode(), digest_size=8)
    return random.Random(int.from_bytes(h.digest(), "little"))


class PerSampleRng:
    """Drop-in for the random.Random the train transforms consume.

    Inside a loader's sample_ctx, delegates to a stream derived from
    (seed, epoch, sample index) — fresh at each context entry, shared by
    all draws of that __getitem__ (e.g. NLVR transforms two images per
    sample from one stream).  Outside any context (direct transform calls
    in tests/tools) falls back to a plain seeded stream, the previous
    behavior."""

    def __init__(self, seed: int = 0):
        self._seed = int(seed)
        self._fallback = random.Random(seed)

    def _rng(self) -> random.Random:
        ctx = getattr(_SAMPLE_TL, "ctx", None)
        if ctx is None:
            return self._fallback
        epoch, index, token = ctx
        # per-thread dict of derived streams for the CURRENT ctx entry,
        # keyed by seed: two PerSampleRng instances alternating draws in
        # one __getitem__ must each keep their own live stream (a single
        # cached slot would restart the evicted stream on every draw)
        derived = getattr(_SAMPLE_TL, "derived", None)
        if derived is None or derived[0] != token:
            derived = (token, {})
            _SAMPLE_TL.derived = derived
        rng = derived[1].get(self._seed)
        if rng is None:
            rng = _derived_rng(self._seed, epoch, index)
            derived[1][self._seed] = rng
        return rng

    # the transform surface of random.Random
    def random(self):
        return self._rng().random()

    def uniform(self, a, b):
        return self._rng().uniform(a, b)

    def randint(self, a, b):
        return self._rng().randint(a, b)

    def choices(self, population, k=1):
        return self._rng().choices(population, k=k)

    def choice(self, seq):
        return self._rng().choice(seq)


def normalize_chw(img: Image.Image) -> np.ndarray:
    a = np.asarray(img, np.float32) / 255.0
    a = (a - MEAN) / STD
    return a.transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Native JPEG fast path (madtp_tpu/native): fused decode->crop->resize
# [->normalize], GIL-free.  MADTP_NATIVE_JPEG=1 is BIT-EXACT vs the PIL
# path below (tests/test_native_jpeg.py); =2 additionally enables M/8
# DCT-scaled decode (faster, a few uint8 LSB of deviation).  Default off.
# ---------------------------------------------------------------------------


def _native_mode() -> int:
    mode = {"1": 1, "2": 2}.get(os.environ.get("MADTP_NATIVE_JPEG", ""), 0)
    if not mode:
        return 0
    from madtp_tpu import native

    return mode if native.available() else 0


def _native_jpeg_bytes(img) -> Tuple[Optional[bytes], int]:
    mode = _native_mode()
    if (not mode or getattr(img, "format", None) != "JPEG"
            or not getattr(img, "filename", None)):
        return None, mode
    try:
        with open(img.filename, "rb") as f:
            return f.read(), mode
    except OSError:
        return None, mode


def eval_transform(img: Image.Image, image_size: int) -> np.ndarray:
    data, mode = _native_jpeg_bytes(img)
    if mode:
        from madtp_tpu import native

        if data is not None:
            try:
                return native.decode_resize_norm(data, image_size,
                                                 dct_scale=mode == 2)
            except native.UnsupportedJpeg:
                pass
        # non-JPEG (or fallback): fused resize+normalize on decoded pixels
        return native.resize_norm(
            np.asarray(img.convert("RGB"), np.uint8), image_size)
    img = img.convert("RGB").resize((image_size, image_size), Image.BICUBIC)
    return normalize_chw(img)


def _random_crop_box(W: int, H: int, rng: random.Random, scale,
                     ratio=(3 / 4, 4 / 3)) -> Optional[Tuple[int, int, int, int]]:
    """RandomResizedCrop box draw (same rng consumption on every path)."""
    area = W * H
    for _ in range(10):
        target = rng.uniform(*scale) * area
        log_r = (np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(rng.uniform(*log_r))
        w = int(round((target * ar) ** 0.5))
        h = int(round((target / ar) ** 0.5))
        if 0 < w <= W and 0 < h <= H:
            x = rng.randint(0, W - w)
            y = rng.randint(0, H - h)
            return x, y, w, h
    return None


def random_resized_crop(img: Image.Image, size: int, rng: random.Random,
                        scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3)) -> Image.Image:
    box = _random_crop_box(img.size[0], img.size[1], rng, scale, ratio)
    if box is None:
        return img.resize((size, size), Image.BICUBIC)
    x, y, w, h = box
    return img.crop((x, y, x + w, y + h)).resize((size, size), Image.BICUBIC)


# ---------------------------------------------------------------------------
# RandAugment (10-op palette, reference data/__init__.py:24-25)
# ---------------------------------------------------------------------------


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         resample=Image.BICUBIC)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         resample=Image.BICUBIC)


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, v * img.size[0], 0, 1, 0),
                         resample=Image.BICUBIC)


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v * img.size[1]),
                         resample=Image.BICUBIC)


_OPS = {
    "Identity": (lambda img, v: img, 0.0, 0.0),
    "AutoContrast": (lambda img, v: ImageOps.autocontrast(img), 0.0, 0.0),
    "Equalize": (lambda img, v: ImageOps.equalize(img), 0.0, 0.0),
    "Brightness": (lambda img, v: ImageEnhance.Brightness(img).enhance(1 + v),
                   -0.9, 0.9),
    "Sharpness": (lambda img, v: ImageEnhance.Sharpness(img).enhance(1 + v),
                  -0.9, 0.9),
    "ShearX": (_shear_x, -0.3, 0.3),
    "ShearY": (_shear_y, -0.3, 0.3),
    "TranslateX": (_translate_x, -0.3, 0.3),
    "TranslateY": (_translate_y, -0.3, 0.3),
    "Rotate": (lambda img, v: img.rotate(v, resample=Image.BICUBIC), -30, 30),
}

DEFAULT_AUGS = ["Identity", "AutoContrast", "Brightness", "Sharpness",
                "Equalize", "ShearX", "ShearY", "TranslateX", "TranslateY",
                "Rotate"]


def rand_augment(img: Image.Image, n: int, m: int, rng: random.Random,
                 augs: Sequence[str] = tuple(DEFAULT_AUGS)) -> Image.Image:
    """Apply ``n`` random ops at magnitude ``m`` (0-10 scale)."""
    for name in rng.choices(list(augs), k=n):
        fn, lo, hi = _OPS[name]
        v = lo + (hi - lo) * (m / 10.0) * rng.random()
        img = fn(img, v)
    return img


def _train_augmented(img: Image.Image, image_size: int, rng: random.Random,
                     min_scale: float) -> Image.Image:
    """Shared train pipeline: RandomResizedCrop -> flip -> RandAugment.
    The crop box is drawn BEFORE any decode so native and PIL paths consume
    the same rng stream (the native path decodes only the crop region)."""
    data, mode = _native_jpeg_bytes(img)
    box = _random_crop_box(img.size[0], img.size[1], rng, (min_scale, 1.0))
    cropped = None
    if data is not None:
        from madtp_tpu import native

        try:
            cropped = Image.fromarray(native.decode_resize(
                data, image_size, crop=box, dct_scale=mode == 2))
        except native.UnsupportedJpeg:
            cropped = None
    if cropped is None and mode:
        from madtp_tpu import native

        cropped = Image.fromarray(native.resize(
            np.asarray(img.convert("RGB"), np.uint8), image_size, crop=box))
    if cropped is None:
        img = img.convert("RGB")
        if box is None:
            cropped = img.resize((image_size, image_size), Image.BICUBIC)
        else:
            x, y, w, h = box
            cropped = img.crop((x, y, x + w, y + h)).resize(
                (image_size, image_size), Image.BICUBIC)
    if rng.random() < 0.5:
        cropped = cropped.transpose(Image.FLIP_LEFT_RIGHT)
    return rand_augment(cropped, 2, 5, rng)


def train_transform(img: Image.Image, image_size: int, rng: random.Random,
                    min_scale: float = 0.5) -> np.ndarray:
    return normalize_chw(_train_augmented(img, image_size, rng, min_scale))


def train_transform_uint8(img: Image.Image, image_size: int,
                          rng: random.Random,
                          min_scale: float = 0.5) -> np.ndarray:
    """Train-side uint8 host buffer: identical crop/flip/augment pipeline
    (same rng stream as :func:`train_transform`), but returns the augmented
    uint8 HWC image for on-device normalization
    (ops/layers.normalize_images) — the drivers' ``--uint8_feed``."""
    return np.asarray(_train_augmented(img, image_size, rng, min_scale),
                      np.uint8)


def eval_resize_uint8(img: Image.Image, image_size: int) -> np.ndarray:
    """Host side of the on-device pipeline: bicubic resize only, uint8 HWC.
    Ships 4x less host->device traffic than normalized fp32; pair with
    :func:`madtp_tpu.ops.layers.normalize_images` inside the jitted step."""
    data, mode = _native_jpeg_bytes(img)
    if mode:
        from madtp_tpu import native

        if data is not None:
            try:
                return native.decode_resize(data, image_size,
                                            dct_scale=mode == 2)
            except native.UnsupportedJpeg:
                pass
        return native.resize(np.asarray(img.convert("RGB"), np.uint8),
                             image_size)
    img = img.convert("RGB").resize((image_size, image_size), Image.BICUBIC)
    return np.asarray(img, np.uint8)
