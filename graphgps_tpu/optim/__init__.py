from .optimizers import (build_optimizer, build_schedule, ReduceLROnPlateau,
                         make_tx)  # noqa: F401
