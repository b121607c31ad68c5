"""Resume every interrupted training run under a directory.

Capability parity with reference utils/aws/resume.py:17-40 (the spot-instance
recovery daemon): scan runs/*/last.ckpt, skip finished runs, relaunch each
with --resume. Useful after preemption of a TPU VM.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def resume_all(root="runs/train", epochs_key="epoch", dry_run=False, log_fn=print):
    import json

    launched = []
    for ckpt in sorted(Path(root).glob("**/last.ckpt")):
        meta_file = Path(str(ckpt) + ".json")
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        log_fn(f"resuming {ckpt} (epoch {meta.get('epoch', '?')})")
        cmd = [sys.executable, "train.py", "--resume", str(ckpt), "--save-dir", str(ckpt.parent)]
        if meta.get("cfg"):
            cmd += ["--cfg", str(meta["cfg"])]
        if not dry_run:
            subprocess.Popen(cmd)
        launched.append(cmd)
    return launched


if __name__ == "__main__":
    resume_all(sys.argv[1] if len(sys.argv) > 1 else "runs/train")
