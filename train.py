#!/usr/bin/env python
"""Thin wrapper: `python train.py ...` == `python -m leadyolo_tpu.cli.train ...`
(mirrors the reference's top-level workload scripts)."""
from leadyolo_tpu.cli.train import main

if __name__ == "__main__":
    main()
