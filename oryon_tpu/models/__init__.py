from oryon_tpu.models.tokenizer import ClipTokenizer
from oryon_tpu.models.oryon import OryonModel, OryonOutputs
