"""The runnable examples must stay runnable — they are the porting and
pipeline documentation a reference user follows first."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pretraining_pipeline_example(sf_dir, tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "pretraining_pipeline.py"),
         sf_dir, str(tmp_path / "corpus")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "materialized:" in out.stdout, out.stdout
