from msnv_tpu.training.optim import make_optimizer
from msnv_tpu.training.trainer import Trainer
