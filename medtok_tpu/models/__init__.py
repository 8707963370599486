from medtok_tpu.models.bert import BertEncoder  # noqa: F401
from medtok_tpu.models.graph_encoder import GraphEncoder  # noqa: F401
from medtok_tpu.models.quantizer import SoftVQQuantizer  # noqa: F401
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer  # noqa: F401
