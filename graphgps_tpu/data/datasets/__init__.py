from . import synthetic  # noqa: F401 — populate registry
from . import real  # noqa: F401
from . import more_real  # noqa: F401
from .base import DatasetSplits, load_dataset
