from . import layers  # noqa: F401
from .specformer import SpecFormer  # noqa: F401
from .dmt import DMT  # noqa: F401
from .dmt_wo_eq import DMT_WO_EQ  # noqa: F401
from .cdgs import CDGS  # noqa: F401
from . import ema  # noqa: F401
