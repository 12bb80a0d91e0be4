from .activation import get_activation_function
from .random import set_seed

__all__ = ["get_activation_function", "set_seed"]
