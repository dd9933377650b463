"""Import-sweep guard: every module under plumberapp_spark/ (and the
tools/ helpers) must import cleanly.

Exists because round 7 shipped a commit that clobbered
``metrics/profiler.py`` and left four optimizer modules ImportError-dead
while the driver's inline queries stayed green — a partial test run
could not see it. This test makes any module-level breakage fail
collection-independent and loudly.
"""

from __future__ import annotations

import importlib
import pkgutil
import warnings

import pytest

import plumberapp_spark


def _package_modules() -> list[str]:
    return sorted(
        m.name
        for m in pkgutil.walk_packages(
            plumberapp_spark.__path__, "plumberapp_spark."
        )
    )


@pytest.mark.parametrize("module_name", _package_modules())
def test_package_module_imports(module_name):
    with warnings.catch_warnings():
        # a DeprecationWarning at import time (e.g. an invalid escape in
        # an oracle string) is a latent SyntaxError in a future Python
        warnings.simplefilter("error", DeprecationWarning)
        importlib.import_module(module_name)


TOOLS = [
    "tools.check_correctness",
    "tools.time_queries",
    "tools.demo_optimize",
    "tools.gen_scaled",
    "tools.gen_zipf_docs",
]


@pytest.mark.parametrize("module_name", TOOLS)
def test_tools_module_imports(module_name):
    importlib.import_module(module_name)


def test_entry_module_imports():
    import __spark_entry__  # noqa: F401

    assert callable(__spark_entry__.entry)
    assert __spark_entry__.queries()
    assert __spark_entry__.oracle_sql()
