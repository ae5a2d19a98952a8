from .core import OP_COMPILERS  # noqa: F401
