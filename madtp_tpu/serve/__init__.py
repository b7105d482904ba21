from madtp_tpu.serve.artifact import (  # noqa: F401
    ServingModel,
    load_artifact,
    save_artifact,
)


def __getattr__(name):  # lazy: the artifact loader must not drag http in
    if name in ("ArtifactServer", "ServingClient"):
        from madtp_tpu.serve import server

        return getattr(server, name)
    raise AttributeError(name)
