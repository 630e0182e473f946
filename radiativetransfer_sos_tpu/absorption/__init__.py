from .atmospheres import gas_columns, ATMOSPHERE_NAMES  # noqa: F401
from .ckd import load_ckd, CkdTables  # noqa: F401
from .absprofile import (ki_per_layer, tau_abs_all_terms,  # noqa: F401
                         aik_weights, tau_abs_mode2)
