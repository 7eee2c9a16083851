"""objgan_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of Obj-GAN (jamesli1618/Obj-GAN; arXiv:1902.10740).

Three-stage object-driven text-to-image synthesis:

  Stage A  (:mod:`objgan_tpu.models.box_generator`)
      attentive seq2seq LSTM: COCO caption -> sequence of (class label,
      bounding box) tuples, box head is a sketch-RNN-style Gaussian mixture.

  Stage B  (:mod:`objgan_tpu.models.shape_generator`)
      bi-directional conv-LSTM GAN: box sequence -> per-object binary
      instance masks.

  Stage C  (:mod:`objgan_tpu.models.generator` / ``discriminator``)
      cascaded attentive generator (64 -> 128 -> 256 px) with grid attention
      and object-driven attention, trained against per-scale patch
      discriminators and an object-wise Fast R-CNN discriminator (Pallas
      ROI-align), with DAMSM text-image matching losses.

Everything is designed TPU-first: NHWC layouts, static MAX_OBJECTS padding
with validity masks (no dynamic shapes under jit), ``lax.scan`` recurrences,
bfloat16-friendly compute, and data parallelism via ``jax.sharding.Mesh`` +
NamedSharding (XLA collectives over ICI) rather than any hand-written
communication layer.

The reference tree was unavailable at build time (see SURVEY.md §0); parity
targets come from the Obj-GAN paper and the driver's component checklist in
BASELINE.json.
"""

__version__ = "0.1.0"
