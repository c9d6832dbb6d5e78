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


def test_incremental_excludes_input():
    """--incremental reads the warehouse, so --input/--input-table must be
    rejected rather than silently ignored (r3 ADVICE: confusing contract)."""
    with pytest.raises(SystemExit):
        submit_job.parse_args(
            ["--warehouse", "/tmp/x", "--incremental", "/tmp/new.parquet",
             "--input", "/tmp/t.parquet"]
        )


def test_incremental_does_not_require_input():
    """--incremental alone must pass argparse validation (the prior run's
    records come from the warehouse, not --input)."""
    args = submit_job.parse_args(
        ["--warehouse", "/tmp/x", "--incremental", "/tmp/new.parquet"]
    )
    assert args.incremental == "/tmp/new.parquet"


def test_checkpoint_flags_parse():
    args = submit_job.parse_args(
        ["--warehouse", "/tmp/x", "--input", "/tmp/t.parquet",
         "--checkpoint-dir", "/tmp/ckpt", "--cc-reliable-every", "5"]
    )
    assert args.cc_reliable_every == 5 and args.checkpoint_dir == "/tmp/ckpt"


def test_cc_reliable_requires_checkpoint_dir():
    with pytest.raises(SystemExit):
        submit_job.parse_args(
            ["--warehouse", "/tmp/x", "--input", "/tmp/t.parquet",
             "--cc-reliable-every", "5"]
        )


def test_enhancement_choice_validated():
    """--enhancement takes the reference's four aggressiveness levels and
    rejects anything else; default is the reference-parity 'none'."""
    args = submit_job.parse_args(
        ["--warehouse", "/tmp/x", "--input", "/tmp/t.parquet",
         "--enhancement", "moderate"]
    )
    assert args.enhancement == "moderate"
    args = submit_job.parse_args(["--warehouse", "/tmp/x", "--input", "/tmp/t.parquet"])
    assert args.enhancement == "none"
    with pytest.raises(SystemExit):
        submit_job.parse_args(
            ["--warehouse", "/tmp/x", "--input", "/tmp/t.parquet",
             "--enhancement", "max"]
        )
