from bubbleformer_tpu.models._api import MODELS, get_model, list_models, register_model
from bubbleformer_tpu.models.axial_vit import AViT, FiLMAViT, SpaceTimeBlock
from bubbleformer_tpu.models.unets import ClassicUnet, ModernUnet

__all__ = [
    "MODELS",
    "get_model",
    "list_models",
    "register_model",
    "AViT",
    "FiLMAViT",
    "SpaceTimeBlock",
    "ClassicUnet",
    "ModernUnet",
]
