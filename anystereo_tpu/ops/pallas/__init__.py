from anystereo_tpu.ops.pallas.lookup_kernel import (  # noqa: F401
    gather_rows_linear,
    pallas_available,
)
