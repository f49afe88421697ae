from .stability import get_edm_metric, get_2D_edm_metric  # noqa: F401
from .rdkit_metric import eval_rdmol, HAS_RDKIT  # noqa: F401
