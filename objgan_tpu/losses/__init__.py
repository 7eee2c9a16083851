from objgan_tpu.losses.damsm_loss import (  # noqa: F401
    damsm_loss,
    sent_loss,
    words_loss,
)
