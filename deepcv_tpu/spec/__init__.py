from deepcv_tpu.spec.tokens import YamlTokens  # noqa: F401
from deepcv_tpu.spec.creators import (  # noqa: F401
    CreatorContext, ForwardCallback, submodule_creator, get_creator,
    BASIC_SUBMODULE_CREATORS, TENSOR_REDUCTION_FNS, get_reduction_fn,
)
from deepcv_tpu.spec.graph import SpecModule, define_nn_architecture, SpecError  # noqa: F401
from deepcv_tpu.spec.module import DeepcvModule, DeepcvModuleDescriptor  # noqa: F401
