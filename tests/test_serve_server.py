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


def test_server_rejects_malformed_and_oversized_bodies(nlvr_server):
    """Client mistakes must map to 4xx, not 500: garbage npz -> 400,
    empty body -> 400, and a huge Content-Length -> 413 BEFORE the server
    buffers it (one bad client must not OOM the process that owns the
    accelerator)."""
    import http.client

    srv, *_ = nlvr_server
    host, port = srv.server_address

    def post(body: bytes, claim_len=None):
        conn = http.client.HTTPConnection(host, port, timeout=30)
        try:
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Length",
                           str(len(body) if claim_len is None else claim_len))
            conn.endheaders()
            if body:
                conn.send(body)
            r = conn.getresponse()
            return r.status, r.read()
        finally:
            conn.close()

    code, body = post(b"this is not an npz archive")
    assert code == 400 and b"npz" in body
    code, _ = post(b"")
    assert code == 400
    cap = srv.default.max_body_bytes()
    code, body = post(b"x", claim_len=cap + 1)
    assert code == 413 and b"budget" in body


def test_server_sub_batch(nlvr_server):
    """A 1-sample request against the batch-2 artifact: padded to the
    exported shape (NLVR's image pair = two n-row blocks) by replicating
    the request's OWN rows, outputs sliced back.  Self-replication cannot
    change DTP's batch-max keep counts, so the result is BIT-equal to the
    same sample run as a full batch of itself — i.e. exactly what the
    request would get served alone (batch-1 semantics, NOT the row it
    would get inside someone else's batch)."""
    srv, (images, ids, mask, t), want = nlvr_server
    client = ServingClient(srv.url)
    B = np.asarray(ids).shape[0]
    im = np.asarray(images)
    # sample 0's image pair: row 0 (block 0) and row B (block 1)
    sub = client.predict(np.stack([im[0], im[B]]), np.asarray(ids)[:1],
                         np.asarray(mask)[:1], np.asarray(t))
    assert sub[0].shape == (1, 2)
    # ground truth: the artifact's own full-shape call on the self-padded
    # batch (the exact packing _run_padded performs)
    padded_imgs = np.concatenate([np.repeat(im[0:1], B, axis=0),
                                  np.repeat(im[B:B + 1], B, axis=0)])
    want_solo = srv.default._call([
        padded_imgs, np.repeat(np.asarray(ids)[:1], B, axis=0),
        np.repeat(np.asarray(mask)[:1], B, axis=0), np.asarray(t)])
    np.testing.assert_array_equal(sub[0][0], want_solo[0][0])
    # unbatched outputs (kept counts) pass through unsliced
    assert sub[1].shape == np.asarray(jax.tree.leaves(want)[1]).shape


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


@pytest.fixture(scope="module")
def rowind_server(tmp_path_factory):
    """A genuinely row-independent artifact (pure elementwise step) whose
    batching spec declares row_independent — the ONLY kind the dispatcher
    may merge distinct requests on (DTP task exports are batch-coupled and
    never set the flag; see test_dtp_batch_coupling_motivates_merge_gate)."""
    params = {"w": jnp.asarray(np.linspace(0.5, 2.0, 4).astype(np.float32))}

    def fn(params, x, t):
        return x * params["w"] + t

    B = 4
    x = jnp.zeros((B, 4), jnp.float32)
    t = jnp.float32(0.0)
    art = str(tmp_path_factory.mktemp("srv_ri") / "rowind")
    save_artifact(art, fn, params, (x, t),
                  meta={"task": "rowind",
                        "batching": {"batch": B, "inputs": [1, 0],
                                     "outputs": [1],
                                     "row_independent": True}})
    srv = ArtifactServer(art, "127.0.0.1", 0)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_dispatcher_merges_compatible_requests(rowind_server):
    """Unit-level: two 1-sample requests with equal unbatched inputs pack
    into ONE device call whose per-request outputs equal their solo runs;
    a request with a different scalar input refuses to merge."""
    from madtp_tpu.serve.server import _Pending

    srv = rowind_server
    rt = srv.default
    assert rt._aggregate  # the flag enables the dispatcher

    def one_sample(seed, temp):
        x = np.random.RandomState(seed).randn(1, 4).astype(np.float32)
        return rt._validate_cast([x, np.asarray(temp, np.float32)])

    p0 = _Pending(*one_sample(0, 1.0))
    p1 = _Pending(*one_sample(1, 1.0))
    p2 = _Pending(*one_sample(2, 8.0))  # different scalar: no merge

    with rt._cond:
        rt._queue.extend([p0, p1, p2])
        group = rt._take_group_locked()
    assert group == [p0, p1] and rt._queue == [p2]

    calls_before = rt.stats["calls"]
    merged = rt._run_padded(group)
    assert rt.stats["calls"] == calls_before + 1  # ONE call for both
    solo0 = rt._run_padded([_Pending(*one_sample(0, 1.0))])[0]
    solo1 = rt._run_padded([_Pending(*one_sample(1, 1.0))])[0]
    np.testing.assert_array_equal(merged[0][0], solo0[0])
    np.testing.assert_array_equal(merged[1][0], solo1[0])
    rt._queue.clear()


def test_live_aggregation_under_load(rowind_server):
    """End-to-end on the row-independent artifact: hold the device lock so
    queued 1-sample requests pile up, release, and check every response is
    correct and at least one device call served more than one request."""
    import concurrent.futures
    import time

    srv = rowind_server
    client = ServingClient(srv.url)
    w = np.linspace(0.5, 2.0, 4).astype(np.float32)

    def one(seed):
        x = np.random.RandomState(seed).randn(1, 4).astype(np.float32)
        out = client.predict(x, np.asarray(0.5, np.float32))[0]
        np.testing.assert_allclose(out, x * w + 0.5, atol=1e-6)
        return out

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
            futs += [ex.submit(one, 1), ex.submit(one, 2)]
            while len(rt._queue) < 2 and time.time() < deadline:
                time.sleep(0.02)  # both follow-ups queued behind the lock
        finally:
            srv._lock.release()
        for f in futs:
            f.result(timeout=60)  # asserts inside one()

    assert srv.stats["merged"] >= 1


def test_dtp_batch_coupling_motivates_merge_gate(nlvr_server):
    """DTP keep counts are batch-COUPLED (topk_num = max over the batch,
    prune/dtp.py:172/:286 — reference semantics): the same sample's output
    depends on which companions ride the batch.  This is WHY the server
    must never merge distinct requests on a DTP artifact — if this test
    ever fails (rows made independent), the merge gate can be revisited."""
    from tests.test_serve import _tiny_nlvr
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg, params, images, ids, mask, _ = _tiny_nlvr()
    B = np.asarray(ids).shape[0]
    im = np.asarray(images)

    @jax.jit
    def fn(params, images, ids, mask, t):
        return blip_nlvr_forward(params, images, ids, mask, cfg,
                                 temperature=t, prune_active=True)

    t = jnp.float32(1.0)

    def with_companion(comp_img):
        # batch = [sample0, companion]; NLVR images stack pair blocks
        imgs = np.concatenate([im[0:1], comp_img[0:1],
                               im[B:B + 1], comp_img[1:2]])
        logits, (vk, tk) = fn(params, jnp.asarray(imgs),
                              ids[:2], mask[:2], t)
        return np.asarray(logits)[0], np.asarray(vk), np.asarray(tk)

    quiet = np.zeros_like(im[:2])            # companion that prunes hard
    loud = 5.0 * np.asarray(
        np.random.RandomState(3).randn(*im[:2].shape), np.float32)
    l_quiet, vk_q, tk_q = with_companion(quiet)
    l_loud, vk_l, tk_l = with_companion(loud)
    coupled = (not np.array_equal(l_quiet, l_loud)
               or not np.array_equal(vk_q, vk_l)
               or not np.array_equal(tk_q, tk_l))
    assert coupled, (
        "DTP rows became batch-independent — the server's merge gate "
        "(row_independent flag) may be relaxable now")


def test_coupled_artifact_never_merges(nlvr_server):
    """A DTP artifact (no row_independent flag) must NOT merge distinct
    requests: no dispatcher thread, merged counter stays 0, and every
    concurrent 1-sample response is BIT-equal to its solo run."""
    import concurrent.futures

    srv, (images, ids, mask, t), _ = nlvr_server
    rt = srv.default
    assert not rt._aggregate and rt._dispatcher is None
    client = ServingClient(srv.url)
    B = np.asarray(ids).shape[0]
    im, idn, mkn = np.asarray(images), np.asarray(ids), np.asarray(mask)

    def one(j):
        return client.predict(np.stack([im[j], im[B + j]]), idn[j:j + 1],
                              mkn[j:j + 1], np.asarray(t))

    solo = [one(0), one(1)]
    merged_before = rt.stats["merged"]
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(one, [0, 1, 0, 1]))
    for got, j in zip(outs, [0, 1, 0, 1]):
        np.testing.assert_array_equal(got[0], solo[j][0])
    assert rt.stats["merged"] == merged_before == 0


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
