from madtp_tpu.data.tokenizer_bert import BertWordPieceTokenizer
from madtp_tpu.data.tokenizer_clip import ClipBPETokenizer, clip_tokenize
from madtp_tpu.data.text_utils import pre_caption, pre_question, save_result
