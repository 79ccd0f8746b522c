from rescan_line_sted_tpu.sweeps.dose import (  # noqa: F401
    ModalitySweep,
    DoseMatchedComparison,
    dose_matched_sweep,
)
from rescan_line_sted_tpu.sweeps.fov import resolution_fov_sweep  # noqa: F401
