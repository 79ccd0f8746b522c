from rescan_line_sted_tpu.cli import main

main()
