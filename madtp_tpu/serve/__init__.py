from madtp_tpu.serve.artifact import (  # noqa: F401
    ServingModel,
    load_artifact,
    save_artifact,
)
