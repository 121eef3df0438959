from .compiler import compile_ops, apply_ops, OP_REGISTRY

__all__ = ["compile_ops", "apply_ops", "OP_REGISTRY"]
