from objgan_tpu.train.box import BoxTrainer, BoxTrainState  # noqa: F401
from objgan_tpu.train.damsm import DamsmTrainer, DamsmTrainState  # noqa: F401
from objgan_tpu.train.gan import GanTrainer, GanTrainState  # noqa: F401
from objgan_tpu.train.shape import ShapeTrainer, ShapeTrainState  # noqa: F401
