from madtp_tpu.utils.logging import MetricLogger, SmoothedValue
