from .label_generation import label_clouds
from .noise_generation import noise_generation
from .rasterize import rasterize_clouds
from .splitting import split_dataset, create_qsm_test_sets

__all__ = [
    "label_clouds",
    "noise_generation",
    "rasterize_clouds",
    "split_dataset",
    "create_qsm_test_sets",
]
