"""Decode-path golden parity vs the reference's ACTUAL HF ``generate``.

The three inference decode paths — caption beam search, nucleus sampling and
VQA answer ranking — are compared token-for-token against the UNMODIFIED
reference torch code executing through HF ``generate`` /
``BLIP_VQA.rank_answer``:

* beam: ``BertLMHeadModel.generate(num_beams=3, ...)``
  (reference models/blip.py:161-202 passes exactly these args;
  models/med.py:1071-1094 provides prepare_inputs_for_generation /
  _reorder_cache) vs :func:`madtp_tpu.tasks.caption.beam_generate`;
* nucleus: ``generate(do_sample=True, top_p, repetition_penalty=1.1)``
  (models/blip.py:175-186) vs
  :func:`madtp_tpu.tasks.caption.nucleus_generate` — run with a degenerate
  ``top_p`` so the nucleus collapses to the single top token and sampling
  becomes deterministic (torch/JAX RNGs can never match draw-for-draw;
  the top-p FILTER itself is compared against HF's warper separately);
* ranking: ``BLIP_VQA.rank_answer`` (models/blip_vqa.py:156-203) vs
  :func:`madtp_tpu.tasks.vqa.rank_answers`.

All three run with a PRUNED cross-attention memory (dead slots in the
encoder state == zeros in the reference's encoder_attention_mask), which is
exactly how the drivers call them after DTP pruning.

Environment note: this repo's transformers is 4.5x — ``PreTrainedModel`` no
longer inherits ``GenerationMixin``, so the test wraps the reference class
in a trivial subclass that mixes it back in (the reference code itself is
executed unmodified).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import torch_shims

torch_shims.install()

import jax
import jax.numpy as jnp

from madtp_tpu.ckpt.remap import remap_med
from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.models.blip import BlipConfig
from madtp_tpu.prune.dtp import TokenState
from madtp_tpu.tasks.caption import beam_generate, nucleus_generate
from madtp_tpu.tasks.vqa import rank_answers

from tests.test_golden_reference import randomize_state_dict  # noqa: E402

V, H, LAYERS, HEADS, FF = 60, 32, 2, 4, 64
EOS, PAD, BOS = 5, 0, 4


def _ref_decoder(seed=11):
    from models.med import BertLMHeadModel
    from transformers.models.bert.configuration_bert import BertConfig

    try:
        from transformers.generation import GenerationMixin
    except ImportError:  # older transformers keep it on PreTrainedModel
        GenerationMixin = object

    class GenerateLM(BertLMHeadModel, GenerationMixin):
        """Reference class, unmodified, + the GenerationMixin that
        transformers >= 4.50 no longer attaches to PreTrainedModel."""

    rcfg = BertConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=FF,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, is_decoder=True,
        eos_token_id=EOS, pad_token_id=PAD, bos_token_id=BOS,
        use_cache=False,  # cacheless: full-seq recompute per step (the
        # reference's prepare_inputs_for_generation signature predates the
        # past_key_values kwarg, so modern generate never threads the cache
        # anyway — outputs are identical, see module docstring)
    )
    rcfg.encoder_width = H
    rcfg.add_cross_attention = True
    rcfg.evaluate = True
    ref = GenerateLM(rcfg, sd_dim=H)
    ref.eval()
    randomize_state_dict(ref, seed=seed)
    # sharpen the output distribution: with 0.1-std random weights the
    # top-2 log-probs can sit within ~1e-3 of each other, and the two
    # frameworks' independent fp noise (~1e-4) then flips genuine ties —
    # scaling the (tied) embedding matrix widens the gaps so every beam
    # decision is numerically stable on both sides
    with torch.no_grad():
        ref.bert.embeddings.word_embeddings.weight.mul_(4.0)
    # randomize_state_dict assigns each state-dict key its OWN random
    # tensor, but the LM head ties decoder.weight <-> word_embeddings and
    # decoder.bias <-> cls.predictions.bias (shared storage; the last
    # loaded key wins) — re-read the model's actual post-load state so the
    # remap sees the values the reference really computes with
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if v.dtype == torch.float32}
    return ref, sd


def _setup(seed=11, B=2, S=7):
    """Shared fixtures: reference LM + our remapped params + a pruned
    cross-attn memory (row 1 has 2 dead slots)."""
    ref, sd = _ref_decoder(seed)
    params = jax.tree.map(jnp.asarray, remap_med(sd, prefix="",
                                                 has_lm_head=True))
    med = MedConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=FF,
        max_position_embeddings=64, encoder_width=H, sd_dim=H,
    )
    cfg = BlipConfig(vit=ViTConfig(image_size=16, patch_size=16,
                                   embed_dim=H, depth=1, num_heads=HEADS,
                                   sd_dim=H),
                     med=med, sd_dim=H)
    rng = np.random.RandomState(seed + 1)
    memory = (rng.randn(B, S, H) * 0.3).astype(np.float32)
    alive = np.ones((B, S), bool)
    alive[1, -2:] = False  # pruned-memory slots
    enc_state = TokenState(jnp.asarray(memory), jnp.asarray(alive), None)
    return ref, params, cfg, memory, alive, enc_state


def _ref_generate(ref, memory, alive, prompt, **gen_kw):
    # NOTE: the reference caller pre-expands encoder_hidden_states by
    # num_beams (models/blip.py:165) because transformers 4.15 did not
    # expand custom model_kwargs; 4.5x's _expand_inputs_for_generation DOES
    # (same repeat_interleave order), so here the memory is passed
    # unexpanded — the effective computation is identical
    mem = torch.from_numpy(memory)
    att = torch.from_numpy(alive.astype(np.int64))
    with torch.no_grad():
        out = ref.generate(
            input_ids=torch.from_numpy(prompt),
            eos_token_id=EOS, pad_token_id=PAD,
            encoder_hidden_states=mem, encoder_attention_mask=att,
            **gen_kw)
    return out.numpy()


@pytest.mark.parametrize("max_length,min_length", [(12, 3), (9, 6)])
def test_beam_generate_golden_vs_hf(max_length, min_length):
    """3-beam search vs the reference's HF generate, token-for-token,
    over a pruned memory (reference models/blip.py:189-196 args)."""
    ref, params, cfg, memory, alive, enc_state = _setup()
    prompt = np.array([[BOS, 7, 9], [BOS, 8, 3]], np.int64)

    ref_out = _ref_generate(
        ref, memory, alive, prompt, num_beams=3, max_length=max_length,
        min_length=min_length, repetition_penalty=1.0)

    ours = np.asarray(beam_generate(
        params, enc_state, jnp.asarray(prompt), cfg,
        num_beams=3, max_length=max_length, min_length=min_length,
        eos_token_id=EOS, pad_token_id=PAD))

    # HF trims trailing pads to the longest finished sequence; ours is a
    # fixed [B, max_length] buffer padded after EOS — compare up to ref len
    L = ref_out.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref_out)
    assert np.all(ours[:, L:] == PAD)


def test_nucleus_generate_golden_vs_hf_deterministic():
    """Sampling path vs HF generate with a degenerate nucleus (top_p -> 0
    keeps only the argmax, making sampling deterministic on both sides);
    exercises repetition_penalty=1.1 + min_length + EOS banking exactly as
    the reference sample path configures them (models/blip.py:175-186)."""
    ref, params, cfg, memory, alive, enc_state = _setup(seed=23)
    prompt = np.array([[BOS, 7], [BOS, 3]], np.int64)

    ref_out = _ref_generate(
        ref, memory, alive, prompt, do_sample=True, top_p=1e-9,
        max_length=11, min_length=4, repetition_penalty=1.1, top_k=0,
        temperature=1.0, num_return_sequences=1)

    ours = np.asarray(nucleus_generate(
        params, enc_state, jnp.asarray(prompt), cfg,
        jax.random.PRNGKey(0), max_length=11, min_length=4, top_p=1e-9,
        eos_token_id=EOS, pad_token_id=PAD, repetition_penalty=1.1))

    L = ref_out.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref_out)
    assert np.all(ours[:, L:] == PAD)


def test_top_p_filter_matches_hf_warper():
    """Our nucleus filter == HF's TopPLogitsWarper on the same logits (the
    stochastic draw itself can't be compared across frameworks)."""
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.RandomState(3)
    logits = rng.randn(4, V).astype(np.float32) * 2
    for top_p in (0.3, 0.9):
        warper = TopPLogitsWarper(top_p=top_p)
        ref_filtered = warper(None, torch.from_numpy(logits.copy())).numpy()
        ref_keep = ref_filtered > -1e9

        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        sp = jnp.sort(probs, axis=-1)[:, ::-1]
        csum = jnp.cumsum(sp, axis=-1)
        inside = csum - sp < top_p
        thr = jnp.min(jnp.where(inside, sp, jnp.inf), axis=-1, keepdims=True)
        our_keep = np.asarray(probs >= thr)
        np.testing.assert_array_equal(our_keep, ref_keep)


@pytest.mark.parametrize("k", [3, 6])
def test_rank_answers_golden_vs_reference(k):
    """Two-stage answer ranking vs the reference's own ``rank_answer``
    (models/blip_vqa.py:156-203) over a pruned question-state memory."""
    import types

    from models.blip_vqa import BLIP_VQA

    ref, params, cfg, memory, alive, enc_state = _setup(seed=31, B=3, S=6)

    # shell BLIP_VQA instance: rank_answer touches only self.text_decoder
    # and self.tokenizer.pad_token_id (no tokenizer download needed)
    shell = BLIP_VQA.__new__(BLIP_VQA)
    torch.nn.Module.__init__(shell)
    shell.text_decoder = ref
    shell.tokenizer = types.SimpleNamespace(pad_token_id=PAD)

    # answer list: 8 answers, ragged lengths, bos-prefixed (reference
    # compress_vqa_dtp.py:84-87 tokenizes the full list once)
    rng = np.random.RandomState(5)
    n_ans, La = 8, 5
    a_ids = np.full((n_ans, La), PAD, np.int64)
    a_mask = np.zeros((n_ans, La), np.int64)
    for i in range(n_ans):
        # length >= 3 so the unique first token never collides with EOS
        ln = 3 + rng.randint(0, La - 3)
        a_ids[i, 0] = BOS
        a_ids[i, 1:ln] = rng.randint(6, V, size=ln - 1)
        # UNIQUE first tokens: two answers sharing one make their stage-1
        # probabilities exactly equal, and torch.topk / jax.lax.top_k break
        # that tie in different orders (the reference itself is
        # tie-order-arbitrary there)
        a_ids[i, 1] = 6 + i
        a_ids[i, ln - 1] = EOS
        a_mask[i, :ln] = 1

    # reference: question_atts masks the pruned slots (the compacted
    # reference states would simply be shorter; mask-mode is equivalent)
    with torch.no_grad():
        ref_ids = shell.rank_answer(
            torch.from_numpy(memory), torch.from_numpy(alive.astype(np.int64)),
            torch.from_numpy(a_ids), torch.from_numpy(a_mask), k).numpy()

    best, topk = rank_answers(
        params, enc_state, jnp.asarray(a_ids), jnp.asarray(a_mask), cfg,
        k=k, pad_token_id=PAD)
    np.testing.assert_array_equal(np.asarray(best), ref_ids)
