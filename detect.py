#!/usr/bin/env python
"""Thin wrapper: `python detect.py ...` == `python -m leadyolo_tpu.cli.detect ...`
(mirrors the reference's top-level workload scripts)."""
from leadyolo_tpu.cli.detect import main

if __name__ == "__main__":
    main()
