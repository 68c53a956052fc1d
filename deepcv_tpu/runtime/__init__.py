from deepcv_tpu.runtime.native import (  # noqa: F401
    native_available, gather_batch, NativeBatchLoader, build_native_lib,
)
