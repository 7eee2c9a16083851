from objgan_tpu.models.damsm import (  # noqa: F401
    CNNEncoder,
    RNNEncoder,
    build_image_encoder,
    build_text_encoder,
)
from objgan_tpu.models.discriminator import (  # noqa: F401
    DNet,
    ObjectDNet,
    build_discriminators,
)
from objgan_tpu.models.generator import GNet, kl_loss  # noqa: F401
