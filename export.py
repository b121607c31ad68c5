#!/usr/bin/env python
"""Thin wrapper: `python export.py ...` == `python -m leadyolo_tpu.cli.export ...`."""
from leadyolo_tpu.cli.export import main

if __name__ == "__main__":
    main()
