"""Build shim: bake the git-derived version into distributions.

The reference vendors versioneer so `pip install` artifacts carry the
git tag/commit (reference setup.py:1-26). PEP 621 `attr:` dynamic
versions would import the package (and its jax dependency) at build
time, so instead `_version.py` — dependency-free by design — is loaded
AS A FILE here and its computed version handed to setuptools. Installed
metadata then feeds `_version.get_version()`'s importlib fallback.
"""
import importlib.util
import os

from setuptools import setup

_HERE = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "_mcc_version", os.path.join(_HERE, "multicam_calibration_tpu", "_version.py")
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

setup(version=_mod.get_version())
