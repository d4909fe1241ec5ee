"""The runnable examples must stay runnable — they are the porting and
pipeline documentation a reference user follows first."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_port_from_reference_example():
    """All five porting flows — compat facade, Job API, shared-storage
    chunks, registered object-store backend, and the SHIPPED s3 backend
    (mapper-upload -> manifest -> reducer-download via S3Storage with the
    boto3-surface double) — must run end-to-end and agree on the totals."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "port_from_reference.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for marker in (
        "compat facade", "Job API", "shared-storage chunks",
        "object-store handoff", "shipped s3 backend",
    ):
        assert f"{marker}: OK" in out.stdout, out.stdout


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


def test_daily_ingest_example():
    """The incremental-index lifecycle walkthrough (build once, probe /
    append per batch, search spans both ingests) must run end-to-end.
    The fixture dir is PINNED: the example's SPARK_GRAFT_SF_DIR default
    is the bench knob, and inheriting a bench-sized export here would
    blow the timeout."""
    import pytest

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip(f"test fixture dir {sf} not present")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "daily_ingest.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DAILY INGEST LIFECYCLE COMPLETE" in out.stdout
    assert "2 committed ingests" in out.stdout
