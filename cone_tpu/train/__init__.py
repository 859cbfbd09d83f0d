from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step
