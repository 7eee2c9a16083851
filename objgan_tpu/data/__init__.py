from objgan_tpu.data.synthetic import (  # noqa: F401
    synthetic_batch,
    synthetic_layout_batch,
)
