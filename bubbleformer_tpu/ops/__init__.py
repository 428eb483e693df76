from bubbleformer_tpu.ops.attention import scaled_axial_attention

__all__ = ["scaled_axial_attention"]
