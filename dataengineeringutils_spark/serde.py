"""Executor-side serialization guard for Python kernels.

Cloudpickle serializes module-level functions BY REFERENCE (module + name),
so a ``mapInPandas`` / ``applyInPandas`` / ``pandas_udf`` kernel defined in
this package only deserializes on executors that can import the package.
The driver contract gives no such guarantee: the harness may run with any
cwd and a plain SparkSession, and Python workers inherit neither the
driver's ``sys.path`` mutations nor its cwd-relative imports — observed as
``ModuleNotFoundError: dataengineeringutils_spark`` inside
``cloudpickle.loads`` on the worker.

Fix: every module that defines worker-side kernels calls
``pickle_module_by_value(__name__)`` at import time, switching cloudpickle
to BY-VALUE serialization for that module — the kernel's code (and any
same-module helpers it references) travel inside the pickle itself.
Third-party imports (numpy/pandas) stay by-reference; they are installed
on every executor.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle


def pickle_module_by_value(module_name: str) -> None:
    """Register ``module_name`` for by-value cloudpickle serialization."""
    cloudpickle.register_pickle_by_value(sys.modules[module_name])
