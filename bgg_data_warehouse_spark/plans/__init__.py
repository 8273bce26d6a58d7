from .dag import ModelDag
from . import models

__all__ = ["ModelDag", "models"]
