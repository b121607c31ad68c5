#!/usr/bin/env python
"""Thin wrapper: `python benchmarks.py ...` == `python -m leadyolo_tpu.cli.benchmarks ...`."""
from leadyolo_tpu.cli.benchmarks import main

if __name__ == "__main__":
    main()
