from demovlp_tpu.train.optim import make_optimizer, step_decay_lr
from demovlp_tpu.train.state import TrainState, create_train_state
from demovlp_tpu.train.checkpoint import CheckpointManager
from demovlp_tpu.train.base_trainer import BaseTrainer
from demovlp_tpu.train.retrieval import RetrievalTrainer
from demovlp_tpu.train.qa import QATrainer
from demovlp_tpu.train.mc import MCTrainer

__all__ = [
    "make_optimizer",
    "step_decay_lr",
    "TrainState",
    "create_train_state",
    "CheckpointManager",
    "BaseTrainer",
    "RetrievalTrainer",
    "QATrainer",
    "MCTrainer",
]
