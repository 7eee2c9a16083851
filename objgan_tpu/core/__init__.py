from objgan_tpu.core.config import (  # noqa: F401
    Config,
    cfg_from_dict,
    cfg_from_file,
    tiny_test_config,
)
