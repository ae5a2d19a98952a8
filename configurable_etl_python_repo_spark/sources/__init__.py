from .bronze import read_bronze, write_bronze  # noqa: F401
