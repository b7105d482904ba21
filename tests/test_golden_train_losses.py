"""Golden TRAINING-loss parity vs the reference task heads.

The per-module forwards are golden-tested in test_golden_reference.py; here
the full TRAIN-step losses — the quantities the compression fine-tune
actually optimizes — are compared against the UNMODIFIED reference heads'
``forward(train=True)``:

* NLVR: ``BLIP_NLVR.forward`` CE + cosine-embedding FDT over the averaged
  twin image FDT features (reference models/blip_nlvr.py:63-97);
* caption: ``BLIP_Decoder.forward`` label-smoothed LM loss with prompt
  masking + the loss_fdt==loss_lm fallback (models/blip.py:111-159);
* VQA: ``BLIP_VQA.forward`` weighted per-answer LM loss with ragged answer
  replication + FDT (models/blip_vqa.py:60-115).

Our side runs the REAL train steps (train/loops.make_*_train_step) with a
zero-lr optimizer and reads the loss metrics — so the comparison covers
the exact code path the drivers execute.  The reference heads tokenize
INSIDE forward and their factories download a HF tokenizer (zero-egress
env), so each is shell-constructed at tiny dims with a deterministic fake
tokenizer whose ids feed both sides identically.
"""

from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import torch_shims

torch_shims.install()

import jax
import jax.numpy as jnp
import optax

from madtp_tpu.ckpt.remap import remap_med, remap_vit
from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.models.blip import BlipConfig
from madtp_tpu.train import loops
from tests.test_golden_reference import randomize_state_dict

H, HEADS, FF, VOCAB = 64, 4, 256, 60
PAD, BOS, SEP, ENC, CLS = 0, 1, 2, 3, 4


class FakeTok:
    """Deterministic word-level tokenizer with the HF call surface the
    reference heads use inside forward()."""

    pad_token_id, bos_token_id, sep_token_id, enc_token_id = PAD, BOS, SEP, ENC

    def __init__(self):
        self.vocab = {}

    def _encode(self, text):
        ids = [CLS]
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = 5 + len(self.vocab)
            ids.append(self.vocab[w])
        ids.append(SEP)
        return ids

    def __call__(self, texts, padding=None, truncation=False,
                 max_length=None, return_tensors=None):
        if isinstance(texts, str):
            return types.SimpleNamespace(input_ids=self._encode(texts))
        seqs = [self._encode(t) for t in texts]
        if truncation and max_length:
            seqs = [s[:max_length] for s in seqs]
        L = (max_length if (padding == "max_length" and max_length)
             else max(len(s) for s in seqs))
        ids = np.full((len(seqs), L), PAD, np.int64)
        mask = np.zeros((len(seqs), L), np.int64)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        obj = types.SimpleNamespace(input_ids=torch.from_numpy(ids),
                                    attention_mask=torch.from_numpy(mask))
        obj.to = lambda device: obj
        return obj


def _tiny_vit():
    from models.vit import VisionTransformer as RefViT

    return RefViT(img_size=64, patch_size=16, embed_dim=H, depth=2,
                  num_heads=HEADS, evaluate=True, sd_dim=H)


def _tiny_bert_cfg():
    from transformers.models.bert.configuration_bert import BertConfig

    rcfg = BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=HEADS, intermediate_size=FF,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    rcfg.encoder_width = H
    rcfg.add_cross_attention = True
    rcfg.evaluate = True
    return rcfg


def _our_cfg(twin=False):
    vit = ViTConfig(image_size=64, patch_size=16, embed_dim=H, depth=2,
                    num_heads=HEADS, sd_dim=H)
    med = MedConfig(vocab_size=VOCAB, hidden_size=H, num_hidden_layers=2,
                    num_attention_heads=HEADS, intermediate_size=FF,
                    max_position_embeddings=64, encoder_width=H, sd_dim=H,
                    twin_cross=twin)
    return BlipConfig(vit=vit, med=med, sd_num=7, sd_dim=H)


def _resync(ref):
    """Post-randomize re-export: tied LM-head weights share storage, so the
    model's actual state (last load wins) is the ground truth.  COPIES, not
    ``.numpy()`` views: the retrieval forward mutates momentum params,
    queues and temp IN PLACE (EMA / enqueue / clamp_), and a view captured
    'before' the forward would silently read the post-forward values."""
    return {k: v.numpy().copy() for k, v in ref.state_dict().items()
            if v.dtype == torch.float32}


def _metrics(step, *args):
    tx_out = step(*args)
    return {k: float(v) for k, v in tx_out[-1].items()}


def test_nlvr_train_loss_golden():
    from models.blip_nlvr import BLIP_NLVR
    from models.nlvr_encoder import BertModel as RefNlvrBert

    tok = FakeTok()
    ref = BLIP_NLVR.__new__(BLIP_NLVR)
    torch.nn.Module.__init__(ref)
    ref.sd_dim = H
    ref.space_dict = torch.nn.Parameter(torch.randn(7, H))
    ref.criterion = torch.nn.CosineEmbeddingLoss()
    ref.visual_encoder = _tiny_vit()
    ref.text_encoder = RefNlvrBert(_tiny_bert_cfg(), add_pooling_layer=False,
                                   sd_dim=H)
    ref.cls_head = torch.nn.Sequential(
        torch.nn.Linear(H, H), torch.nn.ReLU(), torch.nn.Linear(H, 2))
    ref.tokenizer = tok
    ref.eval()
    randomize_state_dict(ref, seed=20)
    sd = _resync(ref)

    rng = np.random.RandomState(21)
    B = 2
    images = rng.randn(2 * B, 3, 64, 64).astype(np.float32)
    texts = ["the left object is red", "a small thing on the right side"]
    targets = np.array([1, 0])
    T = 0.8

    with torch.no_grad():
        lo_ref, lf_ref = ref(torch.from_numpy(images), texts,
                             torch.from_numpy(targets), temperature=T,
                             train=True)

    cfg = _our_cfg(twin=True)
    params = {
        "visual_encoder": remap_vit(sd, prefix="visual_encoder."),
        "text_encoder": remap_med(sd, prefix="text_encoder.",
                                  twin_cross=True),
        "space_dict": sd["space_dict"],
        "cls_head": {
            "fc1": {"kernel": sd["cls_head.0.weight"].T,
                    "bias": sd["cls_head.0.bias"]},
            "fc2": {"kernel": sd["cls_head.2.weight"].T,
                    "bias": sd["cls_head.2.bias"]},
        },
    }
    params = jax.tree.map(jnp.asarray, params)

    t = tok(texts, padding="longest", return_tensors="pt")
    ids = t.input_ids.numpy().copy()
    ids[:, 0] = ENC  # driver does this before the step
    tx = optax.sgd(0.0)
    step = loops.make_nlvr_train_step(cfg, tx)
    m = _metrics(step, params, tx.init(params), jnp.asarray(images),
                 jnp.asarray(ids), jnp.asarray(t.attention_mask.numpy()),
                 jnp.asarray(targets), jnp.float32(T))
    np.testing.assert_allclose(m["loss_ori"], float(lo_ref), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(m["loss_fdt"], float(lf_ref), rtol=2e-4,
                               atol=2e-5)


def test_caption_train_loss_golden():
    from models.blip import BLIP_Decoder
    from models.med import BertLMHeadModel

    tok = FakeTok()
    ref = BLIP_Decoder.__new__(BLIP_Decoder)
    torch.nn.Module.__init__(ref)
    ref.sd_dim = H
    ref.space_dict = torch.nn.Parameter(torch.randn(7, H))
    ref.criterion = torch.nn.CosineEmbeddingLoss()
    ref.visual_encoder = _tiny_vit()
    ref.text_decoder = BertLMHeadModel(config=_tiny_bert_cfg(), sd_dim=H)
    ref.tokenizer = tok
    ref.prompt = "a picture of "
    ref.prompt_length = len(tok(ref.prompt).input_ids) - 1
    ref.eval()
    randomize_state_dict(ref, seed=22)
    sd = _resync(ref)

    rng = np.random.RandomState(23)
    B = 2
    images = rng.randn(B, 3, 64, 64).astype(np.float32)
    captions = [ref.prompt + "a dog on grass",
                ref.prompt + "two people near water and trees"]
    T = 0.8

    with torch.no_grad():
        lm_ref, lf_ref = ref(torch.from_numpy(images), captions,
                             temperature=T, train=True)

    cfg = _our_cfg()
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": remap_vit(sd, prefix="visual_encoder."),
        "text_decoder": remap_med(sd, prefix="text_decoder.",
                                  has_lm_head=True),
        "space_dict": sd["space_dict"],
    })

    t = tok(captions, padding="longest", truncation=True, max_length=40,
            return_tensors="pt")
    ids = t.input_ids.numpy().copy()
    ids[:, 0] = BOS
    labels = np.where(ids == PAD, -100, ids)
    labels[:, : ref.prompt_length] = -100
    tx = optax.sgd(0.0)
    step = loops.make_caption_train_step(cfg, tx)
    m = _metrics(step, params, tx.init(params), jnp.asarray(images),
                 jnp.asarray(ids), jnp.asarray(t.attention_mask.numpy()),
                 jnp.asarray(labels), jnp.float32(T))
    np.testing.assert_allclose(m["loss_lm"], float(lm_ref), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(m["loss_fdt"], float(lf_ref), rtol=2e-4,
                               atol=2e-5)


def test_vqa_train_loss_golden():
    from models.blip_vqa import BLIP_VQA
    from models.med import BertLMHeadModel, BertModel as RefBert

    tok = FakeTok()
    ref = BLIP_VQA.__new__(BLIP_VQA)
    torch.nn.Module.__init__(ref)
    ref.sd_dim = H
    ref.space_dict = torch.nn.Parameter(torch.randn(7, H))
    ref.criterion = torch.nn.CosineEmbeddingLoss()
    ref.visual_encoder = _tiny_vit()
    ref.text_encoder = RefBert(_tiny_bert_cfg(), add_pooling_layer=False,
                               sd_dim=H)
    ref.text_decoder = BertLMHeadModel(config=_tiny_bert_cfg(), sd_dim=H)
    ref.tokenizer = tok
    ref.eval()
    randomize_state_dict(ref, seed=24)
    sd = _resync(ref)

    rng = np.random.RandomState(25)
    B = 2
    images = rng.randn(B, 3, 64, 64).astype(np.float32)
    questions = ["what color is the ball", "how many dogs are there"]
    answers = ["red", "two", "three dogs"]  # ragged: n = [1, 2]
    n = [1, 2]
    weights = torch.tensor([1.0, 0.6, 0.4])
    T = 0.8

    with torch.no_grad():
        lv_ref, lf_ref = ref(torch.from_numpy(images), questions, answers,
                             train=True, n=n, weights=weights,
                             temperature=T)

    cfg = _our_cfg()
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": remap_vit(sd, prefix="visual_encoder."),
        "text_encoder": remap_med(sd, prefix="text_encoder."),
        "text_decoder": remap_med(sd, prefix="text_decoder.",
                                  has_lm_head=True),
        "space_dict": sd["space_dict"],
    })

    q = tok(questions, padding="longest", truncation=True, max_length=35,
            return_tensors="pt")
    q_ids = q.input_ids.numpy().copy()
    q_ids[:, 0] = ENC
    a = tok(answers, padding="longest", return_tensors="pt")
    a_np = a.input_ids.numpy().copy()
    a_np[:, 0] = BOS
    am_np = a.attention_mask.numpy()
    # pad the ragged flattened answers to [B, K, La] like the driver
    K, La = 2, a_np.shape[1]
    ans_ids = np.zeros((B, K, La), np.int32)
    ans_msk = np.zeros((B, K, La), np.int32)
    w = np.zeros((B, K), np.float32)
    pos = 0
    for b, cnt in enumerate(n):
        ans_ids[b, :cnt] = a_np[pos: pos + cnt]
        ans_msk[b, :cnt] = am_np[pos: pos + cnt]
        w[b, :cnt] = weights.numpy()[pos: pos + cnt]
        pos += cnt

    tx = optax.sgd(0.0)
    step = loops.make_vqa_train_step(cfg, tx, max_answers_per_q=K)
    m = _metrics(step, params, tx.init(params), jnp.asarray(images),
                 jnp.asarray(q_ids), jnp.asarray(q.attention_mask.numpy()),
                 jnp.asarray(ans_ids), jnp.asarray(ans_msk), jnp.asarray(w),
                 jnp.float32(T))
    np.testing.assert_allclose(m["loss_vqa"], float(lv_ref), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(m["loss_fdt"], float(lf_ref), rtol=2e-4,
                               atol=2e-5)


def test_retrieval_train_ita_fdt_losses_golden():
    """BLIP retrieval ITC + dual FDT losses vs the reference's own
    ``BLIP_Retrieval.forward`` (models/blip_retrieval.py:99-283): temp
    clamp, momentum EMA-before-use, queue-concatenated soft targets, and
    the online/momentum FDT pair.  The ITM term uses ``torch.multinomial``
    hard-negative draws that cannot match across frameworks, so loss_itm
    is excluded (its structure is covered by tests/test_train.py); the
    deterministic terms must match exactly."""
    import socket

    from models.blip_retrieval import BLIP_Retrieval
    from models.med import BertModel as RefBert

    if not torch.distributed.is_initialized():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        # world-1 gloo group: the reference's concat_all_gather calls
        # torch.distributed unconditionally (models/blip_retrieval.py:334)
        torch.distributed.init_process_group(
            backend="gloo", init_method=f"tcp://127.0.0.1:{port}",
            rank=0, world_size=1)

    E, Q, B = 16, 8, 4
    tok = FakeTok()
    ref = BLIP_Retrieval.__new__(BLIP_Retrieval)
    torch.nn.Module.__init__(ref)
    ref.sd_dim = H
    ref.space_dict = torch.nn.Parameter(torch.randn(7, H))
    ref.criterion = torch.nn.CosineEmbeddingLoss()
    ref.visual_encoder = _tiny_vit()
    ref.text_encoder = RefBert(_tiny_bert_cfg(), add_pooling_layer=False,
                               sd_dim=H)
    ref.vision_proj = torch.nn.Linear(H, E)
    ref.text_proj = torch.nn.Linear(H, E)
    ref.itm_head = torch.nn.Linear(H, 2)
    ref.visual_encoder_m = _tiny_vit()
    ref.text_encoder_m = RefBert(_tiny_bert_cfg(), add_pooling_layer=False,
                                 sd_dim=H)
    ref.vision_proj_m = torch.nn.Linear(H, E)
    ref.text_proj_m = torch.nn.Linear(H, E)
    ref.model_pairs = [
        [ref.visual_encoder, ref.visual_encoder_m],
        [ref.vision_proj, ref.vision_proj_m],
        [ref.text_encoder, ref.text_encoder_m],
        [ref.text_proj, ref.text_proj_m],
    ]
    ref.temp = torch.nn.Parameter(0.07 * torch.ones([]))
    ref.register_buffer("image_queue", torch.randn(E, Q))
    ref.register_buffer("text_queue", torch.randn(E, Q))
    ref.register_buffer("idx_queue", torch.full((1, Q), -100,
                                                dtype=torch.long))
    ref.register_buffer("ptr_queue", torch.zeros(1, dtype=torch.long))
    ref.momentum = 0.995
    ref.queue_size = Q
    ref.negative_all_rank = False
    ref.tokenizer = tok
    ref.eval()
    randomize_state_dict(ref, seed=26)
    sd = _resync(ref)

    rng = np.random.RandomState(27)
    images = rng.randn(B, 3, 64, 64).astype(np.float32)
    captions = ["a dog runs on grass", "two people near water",
                "a red ball on sand", "trees beside a quiet road"]
    idx = np.array([3, 5, 7, 9])
    alpha, T = 0.4, 0.8

    with torch.no_grad():
        lita_ref, _litm, lfdt_ref, lfdtm_ref = ref(
            torch.from_numpy(images), captions, alpha,
            torch.from_numpy(idx).view(-1, 1), temperature=T, train=True)

    # ---- our side: the REAL retrieval train step ----
    from madtp_tpu.train.loops import (
        MOMENTUM_KEYS, RetrievalTrainState, make_retrieval_train_step,
    )
    from madtp_tpu.train.momentum import FeatureQueue

    cfg = _our_cfg()

    def proj(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": remap_vit(sd, prefix="visual_encoder."),
        "text_encoder": remap_med(sd, prefix="text_encoder."),
        "space_dict": sd["space_dict"],
        "vision_proj": proj("vision_proj"),
        "text_proj": proj("text_proj"),
        "itm_head": proj("itm_head"),
    })
    params_m = jax.tree.map(jnp.asarray, {
        "visual_encoder": remap_vit(sd, prefix="visual_encoder_m."),
        "text_encoder": remap_med(sd, prefix="text_encoder_m."),
        "vision_proj": proj("vision_proj_m"),
        "text_proj": proj("text_proj_m"),
    })
    assert set(params_m) == set(MOMENTUM_KEYS)
    queue = FeatureQueue(
        image=jnp.asarray(sd["image_queue"]),
        text=jnp.asarray(sd["text_queue"]),
        idx=jnp.full((Q,), -100, jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
    )

    import optax as _optax

    tx = _optax.sgd(0.0)
    step = make_retrieval_train_step(
        cfg, tx, alpha=alpha, enc_token_id=ENC, negative_all_rank=False,
        data_shards=1)
    state = RetrievalTrainState(
        params=params, params_m=params_m, opt_state=tx.init(params),
        queue=queue, temp=jnp.float32(float(sd["temp"])))

    t = tok(captions, padding="max_length", truncation=True, max_length=35,
            return_tensors="pt")
    state2, metrics = step(state, jax.random.PRNGKey(0),
                           jnp.asarray(images), jnp.asarray(t.input_ids.numpy()),
                           jnp.asarray(t.attention_mask.numpy()),
                           jnp.asarray(idx), jnp.float32(T))
    np.testing.assert_allclose(float(metrics["loss_ita"]), float(lita_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(metrics["loss_fdt"]), float(lfdt_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(metrics["loss_fdt_m"]),
                               float(lfdtm_ref), rtol=2e-4, atol=2e-5)

    # ---- epoch-0 alpha warmup parity (compress_retrieval_dtp.py:49-53):
    # second step at a mid-ramp alpha, passed as a TRACED per-batch scalar.
    # Both sides carry their own post-step-1 state (EMA'd momentum towers +
    # enqueued queues), so this also pins the state transition.
    alpha_r = alpha * min(1, 3 / 10)  # batch i=3 of a 10-batch epoch 0
    with torch.no_grad():
        lita_r, _litm_r, lfdt_r, lfdtm_r = ref(
            torch.from_numpy(images), captions, alpha_r,
            torch.from_numpy(idx).view(-1, 1), temperature=T, train=True)
    _, metrics_r = step(state2, jax.random.PRNGKey(1),
                        jnp.asarray(images), jnp.asarray(t.input_ids.numpy()),
                        jnp.asarray(t.attention_mask.numpy()),
                        jnp.asarray(idx), jnp.float32(T),
                        jnp.float32(alpha_r))
    np.testing.assert_allclose(float(metrics_r["loss_ita"]), float(lita_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(metrics_r["loss_fdt"]), float(lfdt_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(metrics_r["loss_fdt_m"]),
                               float(lfdtm_r), rtol=2e-4, atol=2e-5)


def test_clip_train_ita_fdt_losses_golden():
    """CLIP compression losses vs the reference's own ``CLIP.forward``
    (clip/model.py:529-595): logit_scale clamp, momentum EMA, queue soft
    targets, online-feature enqueue, dual FDT — including the reference's
    text-momentum quirk (encode_text_m runs the ONLINE transformer +
    ln_final with momentum embeddings/projection; mirrored in
    make_clip_train_step)."""
    import importlib.util as ilu
    import socket
    import sys as _sys

    def _load(name, p):
        spec = ilu.spec_from_file_location(name, p)
        mod = ilu.module_from_spec(spec)
        _sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    if "ref_clip_model" not in _sys.modules:
        _load("ref_clip_mock", "/root/reference/clip/mock.py")
        refclip = _sys.modules["ref_clip_model"] = _load(
            "ref_clip_model", "/root/reference/clip/model.py")
    else:
        refclip = _sys.modules["ref_clip_model"]

    if not torch.distributed.is_initialized():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        torch.distributed.init_process_group(
            backend="gloo", init_method=f"tcp://127.0.0.1:{port}",
            rank=0, world_size=1)

    E, B = 16, 4
    ref = refclip.CLIP(
        embed_dim=E, image_resolution=64, vision_layers=2, vision_width=128,
        vision_patch_size=16, context_length=12, vocab_size=60,
        transformer_width=64, transformer_heads=4, transformer_layers=2,
        evaluate=False, config={"sd_num": 7, "sd_dim": 32},
    )
    ref.eval()
    ref = ref.float()
    randomize_state_dict(ref, seed=28)
    sd = _resync(ref)
    Q = ref.queue_size  # hardcoded 57600 in the reference ctor

    rng = np.random.RandomState(29)
    images = rng.randn(B, 3, 64, 64).astype(np.float32)
    text = np.zeros((B, 12), np.int64)
    for i in range(B):
        text[i, 0] = 57
        text[i, 1: 3 + i % 3] = rng.randint(5, 50, size=2 + i % 3)
        text[i, 3 + i % 3] = 59  # eot (highest id)
    ref.tokenize = lambda caption: torch.from_numpy(text)
    idxv = np.array([3, 5, 7, 9])
    alpha, T = 0.4, 0.8

    with torch.no_grad():
        lita_ref, lfdt_ref, lfdtm_ref = ref(
            torch.from_numpy(images), ["x"] * B, alpha,
            torch.from_numpy(idxv).view(-1, 1), temperature=T)

    # ---- our side: the REAL CLIP train step ----
    from madtp_tpu.ckpt.remap import remap_clip
    from madtp_tpu.core.config import CLIPConfig
    from madtp_tpu.train.loops import (
        CLIP_MOMENTUM_KEYS, ClipTrainState, make_clip_train_step,
    )
    from madtp_tpu.train.momentum import FeatureQueue

    cfg = CLIPConfig(
        embed_dim=E, image_resolution=64, vision_layers=2, vision_width=128,
        vision_patch_size=16, vision_heads_override=2, context_length=12,
        vocab_size=60, transformer_width=64, transformer_heads=4,
        transformer_layers=2, sd_dim=32,
    )
    params = jax.tree.map(jnp.asarray, remap_clip(sd))
    # momentum copies: overlay the *_m weights under the online names and
    # remap again
    sd_m = dict(sd)
    for k, v in sd.items():
        for pre in ("visual_m.", "transformer_m.", "token_embedding_m.",
                    "ln_final_m."):
            if k.startswith(pre):
                sd_m[pre[:-3] + "." + k[len(pre):]] = v
    sd_m["positional_embedding"] = sd["positional_embedding_m"]
    sd_m["text_projection"] = sd["text_projection_m"]
    full_m = jax.tree.map(jnp.asarray, remap_clip(sd_m))
    params_m = {k: full_m[k] for k in CLIP_MOMENTUM_KEYS}

    import optax as _optax

    tx = _optax.sgd(0.0)
    step = make_clip_train_step(cfg, tx, alpha=alpha)
    state = ClipTrainState(
        params=params, params_m=params_m,
        opt_state=tx.init({"params": params,
                           "space_dict": jnp.asarray(sd["space_dict"])}),
        queue=FeatureQueue(
            image=jnp.asarray(sd["image_queue"]),
            text=jnp.asarray(sd["text_queue"]),
            idx=jnp.full((Q,), -100, jnp.int32),
            ptr=jnp.zeros((), jnp.int32)),
        space_dict=jnp.asarray(sd["space_dict"]),
    )
    state2, metrics = step(state, jnp.asarray(images), jnp.asarray(text),
                           jnp.asarray(idxv), jnp.float32(T))
    np.testing.assert_allclose(float(metrics["loss_ita"]), float(lita_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(metrics["loss_fdt"]), float(lfdt_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(metrics["loss_fdt_m"]),
                               float(lfdtm_ref), rtol=5e-4, atol=5e-5)

    # ---- epoch-0 alpha warmup parity (compress_retrieval_clip_dtp.py:45-49):
    # second step at a mid-ramp traced alpha, both sides stateful.
    alpha_r = alpha * min(1, 2 / 8)  # batch i=2 of an 8-batch epoch 0
    with torch.no_grad():
        lita_r, lfdt_r, lfdtm_r = ref(
            torch.from_numpy(images), ["x"] * B, alpha_r,
            torch.from_numpy(idxv).view(-1, 1), temperature=T)
    _, metrics_r = step(state2, jnp.asarray(images), jnp.asarray(text),
                        jnp.asarray(idxv), jnp.float32(T),
                        jnp.float32(alpha_r))
    np.testing.assert_allclose(float(metrics_r["loss_ita"]), float(lita_r),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(metrics_r["loss_fdt"]), float(lfdt_r),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(metrics_r["loss_fdt_m"]),
                               float(lfdtm_r), rtol=5e-4, atol=5e-5)


def test_hard_negative_sampling_distribution_matches_reference():
    """torch.multinomial draws can't be matched, but the SAMPLING
    DISTRIBUTION can: the reference samples proportionally to
    masked_fill(softmax(sim), same-id, 0) (models/blip_retrieval.py:229-243)
    and our categorical over log-weights must induce exactly the same
    normalized distribution per row."""
    import torch.nn.functional as TF

    from madtp_tpu.train.losses import sample_hard_negatives

    rng = np.random.RandomState(30)
    B, E = 5, 8
    fa = rng.randn(B, E).astype(np.float32)
    fb = rng.randn(B, E).astype(np.float32)
    idxv = np.array([1, 2, 2, 3, 4])
    temp = 0.3

    sim = torch.from_numpy(fa) @ torch.from_numpy(fb).t() / temp
    w = TF.softmax(sim, dim=1)
    w = w.masked_fill(torch.from_numpy(idxv)[:, None]
                      == torch.from_numpy(idxv)[None, :], 0)
    ref_dist = (w / w.sum(1, keepdim=True)).numpy()

    # our induced distribution: exp(logw) normalized (what categorical
    # samples from)
    mask = idxv[:, None] == idxv[None, :]
    ours = np.asarray(jax.nn.softmax(
        jnp.asarray(fa) @ jnp.asarray(fb).T / temp, axis=1))
    ours = np.where(mask, 0.0, ours)
    ours = ours / ours.sum(1, keepdims=True)
    np.testing.assert_allclose(ours, ref_dist, atol=1e-6)

    # and sample_hard_negatives never returns a masked index
    out = np.asarray(sample_hard_negatives(
        jax.random.PRNGKey(0), jnp.asarray(fa), jnp.asarray(fb),
        jnp.asarray(idxv), jnp.asarray(idxv), jnp.float32(temp)))
    assert not np.any(idxv[out] == idxv)
