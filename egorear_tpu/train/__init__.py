from egorear_tpu.train.optim import make_optimizer, make_lr_schedule
from egorear_tpu.train.trainer import Trainer
