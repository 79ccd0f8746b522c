from rescan_line_sted_tpu.imaging.point_sted import point_sted_image  # noqa: F401
from rescan_line_sted_tpu.imaging.line_sted import line_sted_image  # noqa: F401
from rescan_line_sted_tpu.imaging.rescan import rescanned_line_sted_image  # noqa: F401
from rescan_line_sted_tpu.imaging.analytic import (  # noqa: F401
    point_system_kernel,
    line_system_kernel,
    rescan_system_kernel,
)
from rescan_line_sted_tpu.imaging.frames import (  # noqa: F401
    line_sted_camera_frames,
    point_sted_camera_frames,
)
from rescan_line_sted_tpu.imaging.analytic import (  # noqa: F401
    rescan_canvas_mean,
    rescan_x_kernels_rfft,
)
from rescan_line_sted_tpu.imaging.boundary import (  # noqa: F401
    acquire_padded,
    apodize_sample,
)
from rescan_line_sted_tpu.imaging.rescan import (  # noqa: F401
    optimal_rescan_factor,
    practical_rescan_factor,
    rescan_kernel_sigma,
)
from rescan_line_sted_tpu.imaging.rescan_point import (  # noqa: F401
    optimal_rescan_factor_point,
    practical_rescan_factor_point,
    rescan_point_canvas_mean,
    rescan_point_system_kernel,
    rescanned_point_sted_image,
)
