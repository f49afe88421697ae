from .info import get_dataset_info  # noqa: F401
from .pipeline import get_dataset, get_batch_iterator, inf_iterator  # noqa: F401
