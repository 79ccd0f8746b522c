from rescan_line_sted_tpu.data.samples import (  # noqa: F401
    siemens_star,
    rings,
    line_pairs,
    sparse_points,
)
