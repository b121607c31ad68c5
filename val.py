#!/usr/bin/env python
"""Thin wrapper: `python val.py ...` == `python -m leadyolo_tpu.cli.val ...`
(mirrors the reference's top-level workload scripts)."""
from leadyolo_tpu.cli.val import main

if __name__ == "__main__":
    main()
