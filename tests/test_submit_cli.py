"""spark-submit entrypoint CLI contract (no JVM needed: imports are lazy)."""

from __future__ import annotations

import importlib.util
import os

import pytest

SPEC = importlib.util.spec_from_file_location(
    "submit_job",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "submit_job.py"),
)
submit_job = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(SPEC and submit_job)


def test_requires_input_or_table():
    with pytest.raises(SystemExit):
        submit_job.main(["--warehouse", "/tmp/x"])


def test_requires_warehouse():
    with pytest.raises(SystemExit):
        submit_job.main(["--input", "/tmp/t.parquet"])
