from rescan_line_sted_tpu.utils.rotate import rotate_image  # noqa: F401
