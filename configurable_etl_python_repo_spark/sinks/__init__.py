from .boundary import (  # noqa: F401
    NULL_SENTINEL,
    to_boundary_strings,
    to_standardized_form,
    write_gold,
    export_normalized,
)
