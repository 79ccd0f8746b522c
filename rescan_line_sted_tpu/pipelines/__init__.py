from rescan_line_sted_tpu.pipelines.figures import (  # noqa: F401
    comparison_pipeline,
    dose_sweep_pipeline,
    fusion_pipeline,
    fov_pipeline,
    rescan_pipeline,
)
