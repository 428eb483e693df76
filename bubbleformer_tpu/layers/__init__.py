from bubbleformer_tpu.layers.attention import AxialAttentionBlock, TemporalAttentionBlock
from bubbleformer_tpu.layers.convs import (
    ClassicUnetBlock,
    Downsample,
    MiddleBlock,
    ResidualBlock,
    Upsample,
)
from bubbleformer_tpu.layers.linear import FiLMMLP, GeluMLP, SirenMLP
from bubbleformer_tpu.layers.norm import InstanceNorm
from bubbleformer_tpu.layers.patching import HMLPDebed, HMLPEmbed
from bubbleformer_tpu.layers.positional import (
    ContinuousPositionBias1D,
    RelativePositionBias,
    t5_bucket_table,
)
from bubbleformer_tpu.layers.stochastic import drop_path

__all__ = [
    "AxialAttentionBlock",
    "TemporalAttentionBlock",
    "ClassicUnetBlock",
    "Downsample",
    "MiddleBlock",
    "ResidualBlock",
    "Upsample",
    "FiLMMLP",
    "GeluMLP",
    "SirenMLP",
    "InstanceNorm",
    "HMLPDebed",
    "HMLPEmbed",
    "ContinuousPositionBias1D",
    "RelativePositionBias",
    "t5_bucket_table",
    "drop_path",
]
