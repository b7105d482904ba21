from madtp_tpu.prune.query import query_model
from madtp_tpu.prune.dtp import TokenState, DTPSignals, dtp_prune, init_token_state
from madtp_tpu.prune.sparsemax import sparsemax
