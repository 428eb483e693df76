"""bubbleformer_tpu — a TPU-native JAX/Flax framework for forecasting boiling
dynamics (BubbleML 2.0) with axial vision transformers.

Re-designed from scratch for TPU (jit/pjit over device meshes, Pallas kernels,
optax optimizers, Orbax checkpointing, on-device `lax.scan` rollout) with the
full capability surface of the reference PyTorch-Lightning codebase
(HPCForge/Bubbleformer, see SURVEY.md).
"""

__version__ = "0.1.0"

from bubbleformer_tpu.models import get_model, list_models, register_model

__all__ = ["get_model", "list_models", "register_model", "__version__"]
