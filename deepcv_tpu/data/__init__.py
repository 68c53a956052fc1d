from deepcv_tpu.data import transforms  # noqa: F401
from deepcv_tpu.data import augmentation  # noqa: F401
from deepcv_tpu.data.datasets import ArrayDataset, load_dataset, split_dataset  # noqa: F401
from deepcv_tpu.data.preprocess import preprocess, PreprocessedDataset  # noqa: F401
