from rescan_line_sted_tpu.pipelines.figures import (  # noqa: F401
    comparison_pipeline,
    dose_sweep_pipeline,
    fusion_pipeline,
    fov_pipeline,
    ism_pipeline,
    rescan_pipeline,
)
from rescan_line_sted_tpu.pipelines.animation import (  # noqa: F401
    line_scan_animation,
)
from rescan_line_sted_tpu.pipelines.report import html_report  # noqa: F401
