from .ancestral import AncestralSampler, make_time_steps  # noqa: F401
from .dpm_solver import DPMSolverPP  # noqa: F401
from .decode import post_process, mol_process  # noqa: F401
