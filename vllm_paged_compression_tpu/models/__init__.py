from .registry import build_model, register_model, supported_architectures

__all__ = ["build_model", "register_model", "supported_architectures"]
