from x2vlm_tpu.models.beit2 import BEiT2, BEiT2Config, grouped_image_embeds
from x2vlm_tpu.models.bert import BertConfig, BertEncoder, BertMLMHead
from x2vlm_tpu.models.xvlm import XVLMBase, XVLMConfig, MlpHead, cross_entropy
from x2vlm_tpu.models.heads import XVLMForPretrain, XVLMForRetrieval
from x2vlm_tpu.models.classification import XVLMForClassification, XVLMForNLVR
from x2vlm_tpu.models.generation import XVLMForVQA, decoder_params_from_text_encoder
from x2vlm_tpu.models.captioning import XVLMForMLMCaptioning, beam_search_generate
from x2vlm_tpu.models.grounding import XVLMForGrounding
from x2vlm_tpu.models.clip_vit import CLIPViT, CLIPViTConfig
from x2vlm_tpu.models.vit import ViT, ViTConfig
from x2vlm_tpu.models.swin import SwinTransformer, SwinConfig
from x2vlm_tpu.models.resampler import PerceiverResampler
from x2vlm_tpu.models.xvlm_plus import (
    XVLMPlusBase, XVLMPlusConfig, XVLMPlusForPretrain, split_params_to_plus,
)
