"""Minimal production HTTP server for serving artifacts.

The reference has NO deployment mode beyond re-running its research stack
per process (``compress_nlvr_dtp.py:153-157`` re-imports torch+HF+timm and
re-traces the model just to answer ``--evaluate``).  This module is the
other half of the TPU-native serving story started by ``serve/artifact.py``:
a process that loads ``jax.export`` artifacts (no model code, no
config/tokenizer stack) and serves them over HTTP with the stdlib only.

One server hosts MANY artifacts — required in practice because one process
owns the accelerator while a task pipeline spans several exported units
(retrieval = image_encoder + text_encoder + itm_rerank; CLIP = two towers).
All models share one device lock; each gets its own dispatch queue.

Wire protocol (``<name>`` may be omitted when one artifact is served):

``GET /healthz``
    ``{"ok": true}`` once every model is warmed up (exported graphs are
    compiled at startup so the first request never pays the compile).
``GET /meta[/<name>]``
    the artifact's ``meta.json`` — including the ``inputs`` spec
    (per-input shape/dtype) a client needs to build requests.  With
    several artifacts and no name: ``{name: meta}``.
``GET /stats[/<name>]``
    request/device-call/merge counters (per model, or ``{name: stats}``);
    row-independent gather artifacts add ``overflow_rows``/``overflow_max``
    (capacity-schedule overflow observed in served rows — see
    ``_ModelRuntime.__init__``).
``POST /predict[/<name>]``
    body: an ``.npz`` whose arrays, in file order, are the call inputs
    (same order as ``meta["inputs"]``).  Arrays are cast to the exported
    dtype when the kind matches (send float32 for a bfloat16 input).
    The AOT graph is fixed-shape; when the artifact records a
    ``batching`` spec (every ``cli/export_serving`` task does), requests
    may carry any sub-batch n <= the exported batch — batched inputs are
    padded to the exported shape by replicating the request's own rows
    (exact: replicas cannot change the batch-max keep counts that couple
    DTP rows) and the batched outputs sliced back to n.  Without the
    spec, shapes must match exactly.
    response: an ``.npz`` of the output leaves in order, dtype-exact
    (ml_dtypes like bfloat16 ride as raw bits + a sidecar json key, the
    same trick as ``ckpt/export.save_native``).

Requests on artifacts whose ``batching`` spec declares
``row_independent: true`` flow through a per-model dispatcher thread that
packs whatever is queued into ONE device call (natural dynamic batching:
while a call is in flight, arriving sub-batch requests accumulate and
ride the next call together — no artificial latency window).  Requests
can merge only when their unbatched inputs (e.g. the DTP temperature, a
VQA answer list) are equal; others wait for a later call.  Artifacts
WITHOUT the flag (all standard DTP task exports — their keep counts are
batch-coupled, reference semantics) never merge distinct requests: each
request gets its own padded call, so its outputs are exactly what it
would get served alone.
"""

from __future__ import annotations

import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

def encode_arrays(arrays: Sequence) -> bytes:
    """Positional arrays -> npz bytes; ml_dtypes (bfloat16/fp8, numpy kind
    'V') ride as uint8 bits + a json key recording the true dtype/shape —
    the SAME codec as the native checkpoint format
    (ckpt/export.encode_ml_dtypes), shared so wire and checkpoint dtype
    handling cannot diverge."""
    from madtp_tpu.ckpt.export import encode_ml_dtypes

    flat = encode_ml_dtypes(
        {f"a{i:04d}": np.asarray(a) for i, a in enumerate(arrays)})
    buf = io.BytesIO()
    np.savez(buf, **flat)
    return buf.getvalue()


def decode_arrays(data: bytes) -> List[np.ndarray]:
    """Inverse of :func:`encode_arrays` (file order preserved)."""
    from madtp_tpu.ckpt.export import decode_ml_dtypes

    with np.load(io.BytesIO(data)) as z:
        flat = {k: z[k] for k in z.files}
    flat = decode_ml_dtypes(flat)
    return [flat[k] for k in sorted(flat)]


class _Handler(BaseHTTPRequestHandler):
    # the server object carries the models; handlers are per-request
    server: "ArtifactServer"

    def log_message(self, fmt, *args):  # quiet by default
        if self.server.verbose:
            super().log_message(fmt, *args)

    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def _route(self, prefix: str) -> Optional["_ModelRuntime"]:
        """Resolve /prefix or /prefix/<name>; None means 'all' for GETs."""
        rest = self.path[len(prefix):]
        if rest in ("", "/"):
            return self.server.default  # may be None (several artifacts)
        name = rest.lstrip("/")
        rt = self.server.runtimes.get(name)
        if rt is None:
            raise _BadRoute(
                f"unknown artifact {name!r}; serving "
                f"{sorted(self.server.runtimes)}")
        return rt

    def do_GET(self):
        try:
            if self.path == "/healthz":
                self._send_json(200, {"ok": self.server.ready})
            elif self.path.startswith("/meta"):
                rt = self._route("/meta")
                self._send_json(200, rt.model.meta if rt else {
                    n: r.model.meta
                    for n, r in self.server.runtimes.items()})
            elif self.path.startswith("/stats"):
                rt = self._route("/stats")
                self._send_json(200, rt.stats if rt else {
                    n: r.stats for n, r in self.server.runtimes.items()})
            else:
                self._send_json(404, {"error": f"no route {self.path}"})
        except _BadRoute as e:
            self._send_json(404, {"error": str(e)})

    def do_POST(self):
        if not self.path.startswith("/predict"):
            self._send_json(404, {"error": f"no route {self.path}"})
            return
        try:
            rt = self._route("/predict")
            if rt is None:
                raise _BadRoute(
                    "several artifacts are served — POST /predict/<name>, "
                    f"one of {sorted(self.server.runtimes)}")
        except _BadRoute as e:
            self._send_json(404, {"error": str(e)})
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            if n <= 0:
                raise _BadRequest(
                    "empty body (Content-Length required; chunked encoding "
                    "is not supported — send the npz with a length)")
            cap = rt.max_body_bytes()
            if n > cap:
                self._send_json(413, {"error": (
                    f"body of {n} bytes exceeds this artifact's input "
                    f"budget ({cap} bytes) — the process that owns the "
                    "accelerator refuses to buffer it")})
                return
            try:
                arrays = decode_arrays(self.rfile.read(n))
            except Exception as e:  # noqa: BLE001 — any parse failure is
                raise _BadRequest(  # the client's malformed payload
                    f"body is not a decodable npz: "
                    f"{type(e).__name__}: {e}") from None
            out = rt.predict(arrays)
        except _BadRequest as e:
            self._send_json(400, {"error": str(e)})
        except _Unavailable as e:
            self._send_json(503, {"error": str(e)})
        except Exception as e:  # surface the failure to the client
            self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
        else:
            self._send(200, encode_arrays(out), "application/octet-stream")


class _BadRequest(ValueError):
    pass


class _BadRoute(ValueError):
    pass


class _Unavailable(RuntimeError):
    """Mapped to HTTP 503: queue timeout under overload, or shutdown."""


class _Pending:
    """One queued request awaiting the dispatcher."""

    __slots__ = ("arrays", "n", "event", "result", "error")

    def __init__(self, arrays, n):
        self.arrays, self.n = arrays, n
        self.event = threading.Event()
        self.result = self.error = None


class _ModelRuntime:
    """One loaded artifact + its dispatch queue.  The device lock is shared
    across all runtimes of a server (one process, one accelerator)."""

    def __init__(self, art_dir: str, device_lock: threading.Lock, *,
                 aggregate: bool, request_timeout: float):
        from madtp_tpu.serve.artifact import load_artifact

        self.model = load_artifact(art_dir)
        self._device_lock = device_lock
        # flat [shape, dtype] pairs in call order, from meta.json's spec
        # (written by save_artifact as a pytree of [shape, dtype] leaves)
        self._inputs = _flat_input_specs(self.model.meta["inputs"])
        self._bat = self.model.meta.get("batching")
        # Cross-request merging is ONLY sound when the exporter declares the
        # step row-independent (batching.row_independent).  DTP keep counts
        # are batch-COUPLED in both modes (topk_num = max over the batch,
        # prune/dtp.py:172,:286 — reference semantics), so merging two
        # requests into one batch changes both requests' keep counts and
        # outputs; none of the standard cli/export_serving tasks set the
        # flag.  Sub-batch PADDING (self-replication of a request's own
        # rows) stays available regardless: replicas of existing rows can
        # never change a batch max, so padding is exact.  A spec with no
        # batched inputs has nothing to merge on either.
        self._aggregate = bool(aggregate and self._bat
                               and any(self._bat["inputs"])
                               and self._bat.get("row_independent"))
        self._request_timeout = request_timeout
        self.stats = {"requests": 0, "calls": 0, "merged": 0}
        # gather-mode row-independent artifacts report per-row DECISION
        # kept counts (prune/dtp.dtp_prune_gather docstring); comparing
        # them to the calibrated capacities (meta batching.kept_outputs ->
        # capacities_<which>) makes schedule overflow OBSERVABLE in
        # production: /stats carries overflow_rows (served rows whose keep
        # decision exceeded some layer's capacity; their extra tokens were
        # folded into the merge token) and overflow_max (worst per-layer
        # token excess seen).
        self._overflow_checks = []
        if self._bat and self._bat.get("row_independent"):
            for idx, which in (self._bat.get("kept_outputs") or {}).items():
                caps = self.model.meta.get(f"capacities_{which}")
                if caps:  # mask/dense exports have no capacities: no cap
                    self._overflow_checks.append(
                        (int(idx), np.asarray(caps, np.int64) - 1))
        if self._overflow_checks:
            self.stats.update({"overflow_rows": 0, "overflow_max": 0})
        self._queue: List[_Pending] = []
        self._cond = threading.Condition()
        self._closing = False
        self._dispatcher = None

    def warmup(self):
        self._call([np.zeros(s, _np_dtype(d)) for s, d in self._inputs])

    def start(self):
        if self._aggregate:
            self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                                daemon=True)
            self._dispatcher.start()

    def close(self):
        with self._cond:
            self._closing = True
            self._cond.notify_all()
        if self._dispatcher is not None:
            self._dispatcher.join(timeout=30)

    # ---- request path ------------------------------------------------

    def max_body_bytes(self) -> int:
        """Upper bound for a request body: the exported input sizes (the
        npz is uncompressed, so wire bytes ~ raw bytes + headers) with 2x
        headroom — one oversized/malicious Content-Length must not OOM the
        process that owns the accelerator."""
        total = sum(int(np.prod(s)) * _np_dtype(d).itemsize
                    for s, d in self._inputs)
        return 2 * total + 65536

    def predict(self, arrays: Sequence[np.ndarray]) -> List[np.ndarray]:
        cast, n = self._validate_cast(arrays)
        with self._cond:  # counters share the dispatch lock
            self.stats["requests"] += 1
        if not self._aggregate:
            return self._run_padded([_Pending(cast, n)])[0]
        p = _Pending(cast, n)
        with self._cond:
            if self._closing:
                raise _Unavailable("server shutting down")
            self._queue.append(p)
            self._cond.notify()
        if not p.event.wait(self._request_timeout):
            with self._cond:
                # still queued: withdraw it so the dispatcher doesn't burn
                # a device call on a request nobody is waiting for (if it's
                # already in flight the result is simply discarded)
                try:
                    self._queue.remove(p)
                except ValueError:
                    pass
            raise _Unavailable(
                f"predict timed out after {self._request_timeout}s in the "
                "dispatch queue (server overloaded)")
        if p.error is not None:
            raise p.error
        return p.result

    def _validate_cast(self, arrays):
        """Shape/dtype validation + dtype cast; batched inputs stay at their
        sub-batch n (padding happens at dispatch).  Returns (cast, n) with
        n=None when the artifact has no batching spec (exact shapes)."""
        if len(arrays) != len(self._inputs):
            raise _BadRequest(
                f"expected {len(self._inputs)} input arrays "
                f"(meta['inputs']), got {len(arrays)}")
        bat = self._bat
        cast, n = [], None
        for i, (a, (shape, dtype)) in enumerate(zip(arrays, self._inputs)):
            a = np.asarray(a)
            mult = bat["inputs"][i] if bat else 0
            if mult:
                if (a.ndim != len(shape)
                        or list(a.shape[1:]) != list(shape[1:])):
                    raise _BadRequest(
                        f"input {i}: trailing dims {list(a.shape)} != "
                        f"exported {list(shape)}")
                rows, rem = divmod(a.shape[0], mult)
                if rem or not 1 <= rows <= bat["batch"]:
                    raise _BadRequest(
                        f"input {i}: leading dim {a.shape[0]} must be "
                        f"n*{mult} with 1 <= n <= {bat['batch']} "
                        f"(exported batch)")
                if n is not None and rows != n:
                    raise _BadRequest(
                        f"input {i}: sub-batch {rows} disagrees with {n} "
                        f"from earlier inputs")
                n = rows
            elif list(a.shape) != list(shape):
                raise _BadRequest(
                    f"input {i}: shape {list(a.shape)} != exported "
                    f"{list(shape)} (AOT graphs are fixed-shape; re-export "
                    f"for a different batch)")
            want = _np_dtype(dtype)
            if a.dtype != want:
                if np.dtype(a.dtype).kind != np.dtype(want).kind and not (
                        np.dtype(a.dtype).kind in "fV"
                        and np.dtype(want).kind in "fV"):
                    raise _BadRequest(
                        f"input {i}: dtype {a.dtype} is not castable to "
                        f"exported {dtype}")
                a = a.astype(want)
            cast.append(a)
        return cast, n

    # ---- dispatch ------------------------------------------------------

    def _dispatch_loop(self):
        while True:
            with self._cond:
                while not self._queue and not self._closing:
                    self._cond.wait()
                if self._closing:
                    for p in self._queue:
                        p.error = RuntimeError("server shutting down")
                        p.event.set()
                    self._queue.clear()
                    return
                group = self._take_group_locked()
            try:
                results = self._run_padded(group)
                for p, r in zip(group, results):
                    p.result = r
            except Exception as e:  # noqa: BLE001 — delivered to the client
                for p in group:
                    p.error = e
            finally:
                for p in group:
                    p.event.set()

    def _take_group_locked(self) -> List[_Pending]:
        """Pop the head request plus every queued request that fits the
        remaining batch rows AND carries equal unbatched inputs (merging
        across different temperatures/answer lists would change results)."""
        bat = self._bat
        group = [self._queue.pop(0)]
        rows = group[0].n
        i = 0
        while i < len(self._queue):
            q = self._queue[i]
            if rows + q.n <= bat["batch"] and all(
                    m or np.array_equal(a, b)
                    for m, a, b in zip(bat["inputs"], q.arrays,
                                       group[0].arrays)):
                group.append(self._queue.pop(i))
                rows += q.n
            else:
                i += 1
        self.stats["merged"] += len(group) - 1
        return group

    def _run_padded(self, group: List[_Pending]) -> List[List[np.ndarray]]:
        """Pack the group's rows into one exported-shape call and split the
        outputs back per request.  Padding replicates the last real row —
        exact in both DTP modes because replicas of rows already in the
        batch cannot change the batch-max keep counts
        (prune/dtp.py:172,:286) that couple rows.  Multi-request groups
        only exist when the artifact declared row_independent (see
        __init__): for batch-coupled steps, merging distinct requests
        WOULD change their outputs."""
        bat = self._bat
        if bat is None or group[0].n is None:
            packed = group[0].arrays  # exact-shape artifact, single request
        else:
            B = bat["batch"]
            rows = sum(p.n for p in group)
            packed = []
            for i, mult in enumerate(bat["inputs"]):
                if not mult:
                    packed.append(group[0].arrays[i])
                    continue
                blocks = []
                for j in range(mult):
                    parts = [p.arrays[i][j * p.n: (j + 1) * p.n]
                             for p in group]
                    if rows < B:
                        parts.append(np.repeat(parts[-1][-1:], B - rows,
                                               axis=0))
                    blocks.append(np.concatenate(parts))
                packed.append(blocks[0] if mult == 1
                              else np.concatenate(blocks))
        leaves = self._call(packed)
        if bat is None or group[0].n is None:
            return [leaves]
        if self._overflow_checks:
            rows = sum(p.n for p in group)  # real rows (padding replicas
            B = bat["batch"]                # duplicate a real row's counts)
            ovf_rows = ovf_max = 0
            for idx, cap1 in self._overflow_checks:
                m = bat["outputs"][idx]
                for j in range(m):
                    seg = np.asarray(leaves[idx][j * B: j * B + rows],
                                     np.int64)
                    ex = seg - cap1[None, :]
                    ovf_rows += int(np.sum(np.any(ex > 0, axis=1)))
                    ovf_max = max(ovf_max, int(ex.max(initial=0)))
            if ovf_rows:
                with self._cond:
                    self.stats["overflow_rows"] += ovf_rows
                    self.stats["overflow_max"] = max(
                        self.stats["overflow_max"], ovf_max)
        results, off = [], 0
        for p in group:
            out = []
            for o, m in zip(leaves, bat["outputs"]):
                if not m:
                    out.append(o)
                else:
                    B = bat["batch"]
                    out.append(np.concatenate(
                        [o[j * B + off: j * B + off + p.n]
                         for j in range(m)]) if m > 1
                        else o[off: off + p.n])
            results.append(out)
            off += p.n
        return results

    def _call(self, arrays) -> List[np.ndarray]:
        import jax

        with self._device_lock:
            out = self.model(*arrays)
            self.stats["calls"] += 1
        return [np.asarray(o) for o in jax.tree.leaves(out)]


def discover_artifacts(path: str) -> Dict[str, str]:
    """``path`` is either one artifact dir (has graph.jaxexport) -> its
    basename maps to it, or a parent whose immediate subdirs are artifacts
    (what ``export_serving`` writes for clip/retrieval) -> one entry per
    subdir."""
    from madtp_tpu.serve.artifact import GRAPH_FILE

    if os.path.exists(os.path.join(path, GRAPH_FILE)):
        return {os.path.basename(os.path.normpath(path)): path}
    subs = {
        d: os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if os.path.exists(os.path.join(path, d, GRAPH_FILE))
    }
    if not subs:
        raise ValueError(
            f"{path} is neither an artifact dir (no graph.jaxexport) nor "
            "a parent of artifact dirs")
    return subs


class ArtifactServer(ThreadingHTTPServer):
    """Serve one or more artifact directories.  ``artifacts`` is a single
    path (artifact dir OR parent of artifact dirs — both auto-discovered)
    or an explicit ``{name: dir}`` mapping.  ``serve_forever()`` blocks;
    tests use ``start_background()`` + ``shutdown()``."""

    daemon_threads = True

    def __init__(self, artifacts: Union[str, Dict[str, str]],
                 host: str = "127.0.0.1", port: int = 0,
                 *, warmup: bool = True, verbose: bool = False,
                 aggregate: bool = True, request_timeout: float = 600.0):
        if isinstance(artifacts, str):
            artifacts = discover_artifacts(artifacts)
        self.verbose = verbose
        self.ready = False
        self._lock = threading.Lock()  # one accelerator, one call stream
        self.runtimes = {
            name: _ModelRuntime(d, self._lock, aggregate=aggregate,
                                request_timeout=request_timeout)
            for name, d in artifacts.items()
        }
        # unambiguous target for name-less routes and the python API
        self.default = (next(iter(self.runtimes.values()))
                        if len(self.runtimes) == 1 else None)
        super().__init__((host, port), _Handler)
        for rt in self.runtimes.values():
            if warmup:
                rt.warmup()
            rt.start()
        self.ready = True

    @property
    def url(self) -> str:
        return f"http://{self.server_address[0]}:{self.server_address[1]}"

    # single-artifact python API (and back-compat): delegate to default
    @property
    def model(self):
        return self.default.model

    @property
    def stats(self):
        return self.default.stats

    def predict(self, arrays: Sequence[np.ndarray],
                name: Optional[str] = None) -> List[np.ndarray]:
        rt = self.runtimes[name] if name else self.default
        if rt is None:
            raise ValueError(
                f"several artifacts are served — pass name=, one of "
                f"{sorted(self.runtimes)}")
        return rt.predict(arrays)

    def shutdown(self):
        for rt in self.runtimes.values():
            rt.close()
        super().shutdown()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def _flat_input_specs(spec) -> List:
    """meta['inputs'] is a pytree whose leaves are [shape, dtype] pairs
    (json-decoded: lists).  Flatten to call order."""
    out = []

    def walk(node):
        if (isinstance(node, list) and len(node) == 2
                and isinstance(node[0], list) and isinstance(node[1], str)
                and all(isinstance(x, int) for x in node[0])):
            out.append((node[0], node[1]))
        elif isinstance(node, list):
            for x in node:
                walk(x)
        elif isinstance(node, dict):
            for k in sorted(node):
                walk(node[k])
        else:
            raise ValueError(f"unrecognized input spec node: {node!r}")

    walk(spec)
    return out


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


class ServingClient:
    """Stdlib client for :class:`ArtifactServer` (urllib; no deps).
    ``name`` selects an artifact on a multi-artifact server (or per call:
    ``predict(*arrays, name="itm_rerank")``)."""

    def __init__(self, url: str, timeout: float = 120.0,
                 name: Optional[str] = None):
        self.url = url.rstrip("/")
        self.timeout = timeout
        self.name = name
        self._meta: Dict[str, dict] = {}  # cached per artifact name

    def _get(self, path: str) -> bytes:
        import urllib.request

        with urllib.request.urlopen(self.url + path,
                                    timeout=self.timeout) as r:
            return r.read()

    def _suffix(self, name: Optional[str]) -> str:
        name = name or self.name
        return f"/{name}" if name else ""

    def meta_for(self, name: Optional[str] = None) -> dict:
        """Meta of one artifact (or the {name: meta} mapping when the
        server hosts several and no name is given).  Cached per name, so
        setting ``self.name`` after a nameless fetch still works."""
        key = name or self.name or ""
        if key not in self._meta:
            self._meta[key] = json.loads(
                self._get("/meta" + self._suffix(name)))
        return self._meta[key]

    @property
    def meta(self) -> dict:
        return self.meta_for(None)

    def stats(self, name: Optional[str] = None) -> dict:
        return json.loads(self._get("/stats" + self._suffix(name)))

    def healthy(self) -> bool:
        try:
            return json.loads(self._get("/healthz")).get("ok", False)
        except OSError:
            return False

    def predict(self, *arrays, name: Optional[str] = None
                ) -> List[np.ndarray]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.url + "/predict" + self._suffix(name),
            data=encode_arrays(arrays),
            headers={"Content-Type": "application/octet-stream"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return decode_arrays(r.read())
        except urllib.error.HTTPError as e:
            body = e.read()
            try:
                detail = json.loads(body).get("error", "")
            except ValueError:  # non-JSON body (e.g. a proxy in the path)
                detail = body[:500].decode(errors="replace")
            raise RuntimeError(f"predict failed ({e.code}): {detail}") \
                from None
