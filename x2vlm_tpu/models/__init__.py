from x2vlm_tpu.models.beit2 import BEiT2, BEiT2Config, grouped_image_embeds
from x2vlm_tpu.models.bert import BertConfig, BertEncoder, BertMLMHead
from x2vlm_tpu.models.xvlm import XVLMBase, XVLMConfig, MlpHead, cross_entropy
from x2vlm_tpu.models.heads import XVLMForPretrain, XVLMForRetrieval
