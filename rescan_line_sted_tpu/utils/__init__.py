from rescan_line_sted_tpu.utils.observability import (  # noqa: F401
    enable_compilation_cache,
)
from rescan_line_sted_tpu.utils.rotate import rotate_image  # noqa: F401
