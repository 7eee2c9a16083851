from objgan_tpu.ops import attention, gmm, lstm, rasterize, roi_align  # noqa: F401
