"""HTTP serving of artifacts (madtp_tpu/serve/server.py).

The reference's only deployment mode is re-running the research stack per
process (compress_nlvr_dtp.py:153-157); this is the beyond-reference
serve-an-artifact-over-HTTP path: export -> ArtifactServer -> ServingClient
parity, protocol errors, and the dtype-exact npz wire codec."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madtp_tpu.serve import save_artifact
from madtp_tpu.serve.server import (
    ArtifactServer,
    ServingClient,
    decode_arrays,
    encode_arrays,
)


def test_wire_codec_roundtrip_dtype_exact():
    import ml_dtypes

    arrays = [
        np.arange(6, dtype=np.float32).reshape(2, 3),
        np.asarray(3, np.int64),
        np.linspace(-2, 2, 8).astype(ml_dtypes.bfloat16).reshape(2, 4),
        np.zeros((), np.float32),
    ]
    back = decode_arrays(encode_arrays(arrays))
    assert len(back) == len(arrays)
    for a, b in zip(arrays, back):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


@pytest.fixture(scope="module")
def nlvr_server(tmp_path_factory):
    from tests.test_serve import _tiny_nlvr
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg, params, images, ids, mask, _ = _tiny_nlvr()

    def fn(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True)
        return logits, vk, tk

    t = jnp.float32(1.0)
    art = str(tmp_path_factory.mktemp("srv") / "nlvr")
    B = ids.shape[0]
    save_artifact(art, fn, params, (images, ids, mask, t),
                  meta={"task": "nlvr",
                        # what cli/export_serving._export_nlvr records:
                        # images stack the pair as two n-row blocks
                        "batching": {"batch": B, "inputs": [2, 1, 1, 0],
                                     "outputs": [1, 0, 0]}})
    srv = ArtifactServer(art, "127.0.0.1", 0)
    srv.start_background()
    want = jax.jit(fn)(params, images, ids, mask, t)
    yield srv, (images, ids, mask, t), want
    srv.shutdown()


def test_server_predict_parity(nlvr_server):
    srv, (images, ids, mask, t), want = nlvr_server
    client = ServingClient(srv.url)
    assert client.healthy()
    assert client.meta["task"] == "nlvr"
    got = client.predict(np.asarray(images), np.asarray(ids),
                         np.asarray(mask), np.asarray(t))
    for g, w in zip(got, jax.tree.leaves(want)):
        np.testing.assert_array_equal(g, np.asarray(w))
    # temperature is a live input over the wire too
    alt = client.predict(np.asarray(images), np.asarray(ids),
                         np.asarray(mask), np.float32(8.0))
    assert not np.array_equal(alt[1], got[1])


def test_server_rejects_bad_requests(nlvr_server):
    srv, (images, ids, mask, t), _ = nlvr_server
    client = ServingClient(srv.url)
    with pytest.raises(RuntimeError, match="expected 4 input arrays"):
        client.predict(np.asarray(images))
    with pytest.raises(RuntimeError, match="disagrees"):
        # images say n=1 (2 rows / mult 2) but ids still carry the full batch
        client.predict(np.asarray(images)[:2], np.asarray(ids),
                       np.asarray(mask), np.asarray(t))
    with pytest.raises(RuntimeError, match="not castable"):
        client.predict(np.asarray(images), np.asarray(ids),
                       np.asarray(mask), np.asarray(3, np.int32))
    with pytest.raises(RuntimeError, match="trailing dims"):
        client.predict(np.asarray(images)[:, :, :8, :], np.asarray(ids),
                       np.asarray(mask), np.asarray(t))


def test_server_sub_batch(nlvr_server):
    """A 1-sample request against the batch-2 artifact: padded to the
    exported shape (NLVR's image pair = two n-row blocks), outputs sliced
    back, values equal to the full-batch run's row 0 (DTP is
    row-independent in mask mode)."""
    srv, (images, ids, mask, t), want = nlvr_server
    client = ServingClient(srv.url)
    B = np.asarray(ids).shape[0]
    im = np.asarray(images)
    # sample 0's image pair: row 0 (block 0) and row B (block 1)
    sub = client.predict(np.stack([im[0], im[B]]), np.asarray(ids)[:1],
                         np.asarray(mask)[:1], np.asarray(t))
    full = jax.tree.leaves(want)
    assert sub[0].shape == (1, 2)
    np.testing.assert_allclose(sub[0][0], np.asarray(full[0])[0],
                               rtol=0, atol=1e-5)
    # unbatched outputs (kept counts) pass through unsliced
    assert sub[1].shape == np.asarray(full[1]).shape


def test_server_concurrent_requests(nlvr_server):
    import concurrent.futures

    srv, (images, ids, mask, t), want = nlvr_server
    client = ServingClient(srv.url)
    args = (np.asarray(images), np.asarray(ids), np.asarray(mask),
            np.asarray(t))
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(lambda _: client.predict(*args), range(4)))
    for got in outs:
        np.testing.assert_array_equal(got[0],
                                      np.asarray(jax.tree.leaves(want)[0]))


def test_dispatcher_merges_compatible_requests(nlvr_server):
    """Unit-level: two 1-sample requests with equal unbatched inputs pack
    into ONE device call whose per-request outputs equal their solo runs;
    a request with a different temperature refuses to merge."""
    from madtp_tpu.serve.server import _Pending

    srv, (images, ids, mask, t), _ = nlvr_server
    B = np.asarray(ids).shape[0]
    im, idn, mkn = np.asarray(images), np.asarray(ids), np.asarray(mask)

    rt = srv.default

    def one_sample(j, temp):
        return rt._validate_cast(
            [np.stack([im[j], im[B + j]]), idn[j:j + 1], mkn[j:j + 1],
             np.asarray(temp, np.float32)])

    p0 = _Pending(*one_sample(0, 1.0))
    p1 = _Pending(*one_sample(1, 1.0))
    p2 = _Pending(*one_sample(0, 8.0))  # different temperature: no merge

    rt._queue = [p0, p1, p2]
    with rt._cond:
        group = rt._take_group_locked()
    assert group == [p0, p1] and rt._queue == [p2]

    calls_before = rt.stats["calls"]
    merged = rt._run_padded(group)
    assert rt.stats["calls"] == calls_before + 1  # ONE call for both
    solo0 = rt._run_padded([_Pending(*one_sample(0, 1.0))])[0]
    solo1 = rt._run_padded([_Pending(*one_sample(1, 1.0))])[0]
    np.testing.assert_allclose(merged[0][0], solo0[0], atol=1e-5)
    np.testing.assert_allclose(merged[1][0], solo1[0], atol=1e-5)
    rt._queue.clear()


def test_live_aggregation_under_load(nlvr_server):
    """End-to-end: hold the device lock so queued 1-sample requests pile
    up, release, and check every response is correct and at least one
    device call served more than one request."""
    import concurrent.futures
    import time

    srv, (images, ids, mask, t), want = nlvr_server
    client = ServingClient(srv.url)
    B = np.asarray(ids).shape[0]
    im, idn, mkn = np.asarray(images), np.asarray(ids), np.asarray(mask)

    def one(j):
        return client.predict(np.stack([im[j], im[B + j]]), idn[j:j + 1],
                              mkn[j:j + 1], np.asarray(t))

    rt = srv.default
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        srv._lock.acquire()
        try:
            req0 = rt.stats["requests"]
            futs = [ex.submit(one, 0)]  # dispatcher grabs this, blocks
            deadline = time.time() + 10
            # wait until the head request arrived AND left the queue (the
            # dispatcher holds it, blocked on the device lock)
            while not (rt.stats["requests"] > req0
                       and not rt._queue) and time.time() < deadline:
                time.sleep(0.02)
            futs += [ex.submit(one, 0), ex.submit(one, 1)]
            while len(rt._queue) < 2 and time.time() < deadline:
                time.sleep(0.02)  # both follow-ups queued behind the lock
        finally:
            srv._lock.release()
        outs = [f.result(timeout=60) for f in futs]

    full = np.asarray(jax.tree.leaves(want)[0])
    np.testing.assert_allclose(outs[0][0][0], full[0], atol=1e-5)
    np.testing.assert_allclose(outs[1][0][0], full[0], atol=1e-5)
    np.testing.assert_allclose(outs[2][0][0], full[1], atol=1e-5)
    assert srv.stats["merged"] >= 1


def test_multi_artifact_server(tmp_path):
    """One server process hosts several artifacts (a task pipeline spans
    units — retrieval: 3, CLIP: 2 — while one process owns the device):
    auto-discovery of a parent dir, /predict/<name> routing, per-name
    meta/stats, nameless POST refused with the name list."""
    from tests.test_serve import _tiny_nlvr
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg, params, images, ids, mask, _ = _tiny_nlvr()

    def logits_fn(params, images, ids, mask, t):
        return blip_nlvr_forward(params, images, ids, mask, cfg,
                                 temperature=t, prune_active=True)[0]

    def kept_fn(params, images, ids, mask, t):
        return blip_nlvr_forward(params, images, ids, mask, cfg,
                                 temperature=t, prune_active=True)[1][0]

    t = jnp.float32(1.0)
    parent = tmp_path / "units"
    save_artifact(str(parent / "logits"), logits_fn, params,
                  (images, ids, mask, t), meta={"task": "nlvr_logits"})
    save_artifact(str(parent / "kept"), kept_fn, params,
                  (images, ids, mask, t), meta={"task": "nlvr_kept"})

    srv = ArtifactServer(str(parent))
    srv.start_background()
    try:
        assert sorted(srv.runtimes) == ["kept", "logits"]
        client = ServingClient(srv.url)
        metas = client.meta  # nameless GET on multi-artifact: {name: meta}
        assert metas["logits"]["task"] == "nlvr_logits"
        assert metas["kept"]["task"] == "nlvr_kept"

        args = (np.asarray(images), np.asarray(ids), np.asarray(mask),
                np.asarray(t))
        got_l = client.predict(*args, name="logits")
        got_k = client.predict(*args, name="kept")
        want_l = jax.jit(logits_fn)(params, images, ids, mask, t)
        want_k = jax.jit(kept_fn)(params, images, ids, mask, t)
        np.testing.assert_array_equal(got_l[0], np.asarray(want_l))
        np.testing.assert_array_equal(got_k[0], np.asarray(want_k))

        # per-name stats; a bound client pins its artifact
        assert client.stats("logits")["requests"] == 1
        bound = ServingClient(srv.url, name="kept")
        np.testing.assert_array_equal(bound.predict(*args)[0],
                                      np.asarray(want_k))
        assert client.stats("kept")["requests"] == 2

        with pytest.raises(RuntimeError, match="POST /predict/<name>"):
            client.predict(*args)
        with pytest.raises(RuntimeError, match="unknown artifact"):
            client.predict(*args, name="nope")
    finally:
        srv.shutdown()


def test_retrieval_pipeline_over_http(tmp_path, monkeypatch, capsys):
    """The full two-stage retrieval rank composed over the wire: a CLI
    retrieval export (3 units) served by ONE process, driven end-to-end —
    ITC features from both towers, top-1 by similarity, image STATES routed
    back through the ITM rerank unit — and equal to the same pipeline on
    the in-process artifacts (which are parity-tested vs the live step)."""
    from tests.test_serve import _tiny_yaml
    from madtp_tpu.cli import export_serving
    from madtp_tpu.serve import load_artifact

    out = tmp_path / "artifact"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "retrieval", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out), "--batch", "2", "--text_len", "10",
         "--rerank_batch", "2"])
    export_serving.main()
    capsys.readouterr()

    rng = np.random.RandomState(11)
    images = rng.randn(2, 3, 64, 64).astype(np.float32)
    ids = rng.randint(1, 80, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    t = np.float32(1.0)

    srv = ArtifactServer(str(out))
    srv.start_background()
    try:
        client = ServingClient(srv.url)
        ifeat, sx, sa = client.predict(images, t, name="image_encoder")
        tfeat, _ = client.predict(ids, mask, t, name="text_encoder")
        sims = tfeat @ ifeat.T
        top1 = sims.argmax(axis=1)
        # stage 2: pair text i with its top-1 image's pruned token state
        scores = client.predict(ids, mask, sx[top1], sa[top1], t,
                                name="itm_rerank")[0]
        assert scores.shape == (2,) and np.isfinite(scores).all()

        img = load_artifact(str(out / "image_encoder"))
        txt = load_artifact(str(out / "text_encoder"))
        rr = load_artifact(str(out / "itm_rerank"))
        ifeat2, sx2, sa2 = (np.asarray(x) for x in img(images, t))
        tfeat2 = np.asarray(txt(ids, mask, t)[0])
        top1_2 = (tfeat2 @ ifeat2.T).argmax(axis=1)
        np.testing.assert_array_equal(top1, top1_2)
        want = np.asarray(rr(ids, mask, sx2[top1_2], sa2[top1_2], t))
        np.testing.assert_allclose(scores, want, atol=1e-6)
    finally:
        srv.shutdown()


def test_serve_cli_end_to_end(tmp_path):
    """python -m madtp_tpu.cli.serve against an export_serving artifact,
    in a subprocess, forced-CPU — the full user path."""
    import socket
    import subprocess
    import sys
    import time

    from tests.test_serve import _tiny_nlvr
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg, params, images, ids, mask, _ = _tiny_nlvr()

    def fn(params, images, ids, mask, t):
        return blip_nlvr_forward(params, images, ids, mask, cfg,
                                 temperature=t, prune_active=True)[0]

    t = jnp.float32(1.0)
    art = str(tmp_path / "nlvr")
    save_artifact(art, fn, params, (images, ids, mask, t), meta={})
    want = np.asarray(jax.jit(fn)(params, images, ids, mask, t))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['serve','--artifact',%r,'--port','%d'];"
        "from madtp_tpu.cli.serve import main; main()" % (art, port))
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        client = ServingClient(f"http://127.0.0.1:{port}", timeout=10)
        deadline = time.time() + 120
        while time.time() < deadline and not client.healthy():
            if proc.poll() is not None:
                raise AssertionError(
                    "server died:\n" + proc.stdout.read().decode())
            time.sleep(0.5)
        assert client.healthy(), "server never became healthy"
        got = client.predict(np.asarray(images), np.asarray(ids),
                             np.asarray(mask), np.asarray(t))
        np.testing.assert_array_equal(got[0], want)
    finally:
        proc.terminate()
        proc.wait(timeout=30)
