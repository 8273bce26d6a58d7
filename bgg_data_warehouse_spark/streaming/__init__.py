from .incremental import high_watermark, merge_by_unique_key, incremental_refresh
from . import tracking

__all__ = ["high_watermark", "merge_by_unique_key", "incremental_refresh", "tracking"]
