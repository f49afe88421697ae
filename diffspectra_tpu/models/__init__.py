from . import layers  # noqa: F401
from .specformer import SpecFormer  # noqa: F401
from .dmt import DMT  # noqa: F401
