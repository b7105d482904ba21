"""Serve an exported artifact over HTTP.

    python -m madtp_tpu.cli.serve --artifact artifacts/nlvr_p0.5 \
        [--host 0.0.0.0] [--port 8765] [--no_warmup] [-v]

The process loads the ``jax.export`` artifact (no model code — see
``madtp_tpu/serve/artifact.py``), compiles it once at startup, and answers
``POST /predict`` with fixed-shape npz batches (protocol in
``madtp_tpu/serve/server.py``).  This is the deployment mode the reference
lacks entirely: its ``--evaluate`` re-imports torch+HF+timm and re-traces
the research stack per process (``compress_nlvr_dtp.py:153-157``).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True,
                   help="artifact directory from cli/export_serving — "
                        "either one artifact or a parent whose subdirs are "
                        "artifacts (clip/retrieval exports); multiple "
                        "artifacts route as POST /predict/<name>")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8765, type=int)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the startup compile (first request pays it)")
    p.add_argument("--no_aggregate", action="store_true",
                   help="disable request aggregation (each request runs "
                        "its own padded device call)")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="log one line per request")
    args = p.parse_args()

    from madtp_tpu.cli.common import enable_compile_cache
    from madtp_tpu.serve.server import ArtifactServer

    enable_compile_cache()
    srv = ArtifactServer(args.artifact, args.host, args.port,
                         warmup=not args.no_warmup, verbose=args.verbose,
                         aggregate=not args.no_aggregate)
    names = ", ".join(f"{n}={rt.model.meta.get('task', '?')}"
                      for n, rt in srv.runtimes.items())
    print(f"SERVING {names} ready on {srv.url}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
