from rescan_line_sted_tpu.io.tiff import array_to_tif, tif_to_array  # noqa: F401
from rescan_line_sted_tpu.io.checkpoint import (  # noqa: F401
    SweepCheckpoint,
    save_state,
    load_state,
)
