from .expr import (  # noqa: F401
    compile_filter,
    compile_literal,
    strftime_to_java,
)
