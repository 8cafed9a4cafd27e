from .cache_engine import CacheEngine
from .model_runner import ModelRunner

__all__ = ["CacheEngine", "ModelRunner"]
