from recondet3d.train.checkpoints import latest_checkpoint, load_checkpoint, save_checkpoint
from recondet3d.train.optim import build_optimizer, cyclic_schedule
from recondet3d.train.trainer import TrainState, Trainer, make_train_step
