from rescan_line_sted_tpu.algorithms.richardson_lucy import (  # noqa: F401
    richardson_lucy,
    richardson_lucy_views,
)
from rescan_line_sted_tpu.algorithms.metrics import (  # noqa: F401
    fwhm_1d,
    fwhm_2d,
    system_resolution_report,
)
from rescan_line_sted_tpu.algorithms.map_deconv import (  # noqa: F401
    map_deconvolve_views,
)
from rescan_line_sted_tpu.algorithms.fusion import (  # noqa: F401
    richardson_lucy_operator,
    rescan_operator,
    multi_orientation_rescan,
    rescan_fusion,
    ism_deconvolve,
)
from rescan_line_sted_tpu.algorithms.calibration import (  # noqa: F401
    fit_acquisition_params,
    fit_line_sted_params,
    fit_point_sted_params,
)
from rescan_line_sted_tpu.algorithms.frc import (  # noqa: F401
    frc_curve,
    frc_resolution,
)
