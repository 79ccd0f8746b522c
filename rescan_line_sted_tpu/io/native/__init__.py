from rescan_line_sted_tpu.io.native.loader import (  # noqa: F401
    native_available,
    tiff_encode_native,
)
