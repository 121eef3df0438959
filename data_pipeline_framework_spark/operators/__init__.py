from .window_ops import apply_window_function, WINDOW_FUNCTIONS

__all__ = ["apply_window_function", "WINDOW_FUNCTIONS"]
