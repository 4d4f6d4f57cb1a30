"""Vendored-dependency wiring.

The container forbids package installs, but PySpark's
``transformWithStateInPandas`` needs a ``google.protobuf`` runtime on
the Python side (its state-server protocol is protobuf). The repo
vendors a loader (``vendor/google/protobuf``) around the public,
BSD-licensed pure-Python protobuf runtime already present in the
container; this module makes that loader importable in BOTH the driver
process and the Python workers Spark forks (workers inherit
``PYTHONPATH`` from the driver's environment in local mode, and from
``spark.executorEnv`` on a cluster).

Call :func:`ensure_vendor_path` before building the SparkSession so the
environment variable is set before the JVM (and thus the python worker
daemon) is launched.
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor"
)


def ensure_vendor_path() -> None:
    """Prepend the repo vendor dir to sys.path + PYTHONPATH when the
    real package is absent. No-op when a real ``protobuf`` install
    exists (the vendor loader must never shadow it)."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    if os.path.isdir(VENDOR_DIR) and VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    pp = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + pp if pp else "")
        )
