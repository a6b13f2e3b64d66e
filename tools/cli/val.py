"""Baseline validator CLI — delegates to the shared mga-val implementation
(mirrors /root/reference/tools/cli/val.py:45-90)."""

from mga_yolo_tpu.cli.val import main

if __name__ == "__main__":
    main()
