from deepcv_tpu.pipelines.framework import Node, Pipeline, ProjectContext  # noqa: F401
from deepcv_tpu.pipelines.registry import create_pipelines  # noqa: F401
