from deepcv_tpu.ops import nn  # noqa: F401
