from .upsample import upsample
from .predict import make_predictions
from .run import run_pipeline

__all__ = ["upsample", "make_predictions", "run_pipeline"]
