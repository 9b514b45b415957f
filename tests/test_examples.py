"""The examples/ scripts must stay runnable — they are the user-facing
front door (each exposes main(spark, sf_dir); the CLI wrapper adds a
session)."""

from __future__ import annotations

import importlib.util
import os

import pytest

EXAMPLES = [
    "metadata_etl",
    "dedup_pipeline",
    "ann_serving",
    "streaming_queue",
    "lakehouse_txn",
]


def _load(name: str):
    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "examples", f"{name}.py"
    )
    spec = importlib.util.spec_from_file_location(f"examples.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, sf_dir, name):
    _load(name).main(spark, sf_dir)
