"""Sparsemax parity vs the UNMODIFIED reference torch module.

The reference constructs ``Sparsemax`` (models/utils.py:35-107) for the MAG
attention but never calls it in the hot path (``Query_model.forward`` uses
plain softmax, models/utils.py:177; the NLVR call is commented out,
models/nlvr_encoder.py:418-422).  It is implemented for capability parity —
these tests make that parity verified, not asserted: forward equality on
random + adversarial inputs in the shapes the reference would feed it
(2-D ``(-1, T)``, nlvr_encoder.py:419; 3-D dim=-1, Query_model), and
gradient equality through torch autograd (the reference's hand-written
``backward`` method is dead code — autograd differentiates its forward).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import torch_shims

torch_shims.install()

import jax
import jax.numpy as jnp

from madtp_tpu.prune.sparsemax import sparsemax
from models.utils import Sparsemax as RefSparsemax  # unmodified reference


CASES = [
    # (name, numpy array builder)
    ("random_2d", lambda rng: rng.randn(5, 11).astype(np.float32)),
    ("random_scaled", lambda rng: (10 * rng.randn(4, 7)).astype(np.float32)),
    # all-equal row: projection spreads mass uniformly (support = all)
    ("ties_uniform", lambda rng: np.zeros((3, 6), np.float32)),
    # duplicate maxima: threshold k lands on a tie boundary
    ("tied_max", lambda rng: np.asarray(
        [[2.0, 2.0, -1.0, 0.0], [5.0, 5.0, 5.0, -5.0]], np.float32)),
    # one dominant logit: saturates to one-hot (support = 1)
    ("one_hot", lambda rng: np.asarray(
        [[30.0, 0.0, -1.0, 2.0], [-4.0, 50.0, 0.0, 1.0]], np.float32)),
    # all-negative inputs (max-shift path)
    ("negative", lambda rng: (-3 - rng.rand(4, 9)).astype(np.float32)),
    # single-logit edge: output must be exactly 1
    ("single_logit", lambda rng: rng.randn(6, 1).astype(np.float32)),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_sparsemax_forward_matches_reference(name, make):
    rng = np.random.RandomState(hash(name) % (2**31))
    x = make(rng)
    ref = RefSparsemax(dim=-1)(torch.from_numpy(x)).numpy()
    ours = np.asarray(sparsemax(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)
    # simplex invariants
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-5)
    assert (ours >= 0).all()


def test_sparsemax_forward_matches_reference_3d():
    """Query_model's att_activation shape (models/utils.py:131): [B, K, N]
    over dim=-1.  The reference's transpose/reshape gymnastics for >2-D
    reduce to a per-(b,k) last-axis projection — ours must agree."""
    rng = np.random.RandomState(7)
    x = rng.randn(2, 5, 9).astype(np.float32)
    ref = RefSparsemax(dim=-1)(torch.from_numpy(x)).numpy()
    ours = np.asarray(sparsemax(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)


def test_sparsemax_grads_match_reference_autograd():
    rng = np.random.RandomState(11)
    x = rng.randn(3, 8).astype(np.float32)
    w = rng.randn(3, 8).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    (RefSparsemax(dim=-1)(xt) * torch.from_numpy(w)).sum().backward()
    ref_grad = xt.grad.numpy()

    ours_grad = np.asarray(jax.grad(
        lambda a: jnp.sum(sparsemax(a, axis=-1) * jnp.asarray(w))
    )(jnp.asarray(x)))
    np.testing.assert_allclose(ours_grad, ref_grad, atol=1e-5, rtol=1e-5)
