from .state import TrainState, create_train_state  # noqa: F401
from .steps import make_train_step  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
