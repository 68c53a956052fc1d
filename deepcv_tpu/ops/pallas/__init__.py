from deepcv_tpu.ops.pallas.fused_augment import fused_augment_normalize  # noqa: F401
from deepcv_tpu.ops.pallas.fused_layer import fused_conv2d_bias_act  # noqa: F401
