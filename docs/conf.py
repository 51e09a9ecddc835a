"""Sphinx configuration — autodoc over the package's docstrings.

Mirrors the reference's docs pipeline (reference docs/conf.py:36-37 uses
sphinx.ext.autodoc + napoleon over numpydoc docstrings; readthedocs-hosted).
Build with ``make -C docs html`` wherever sphinx is installed; environments
without sphinx use the dependency-free generator (``python docs/gen_api.py``
-> api.md), which tests/test_docs.py keeps fresh in CI.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pyaudiodsptools_tpu"
author = "pyaudiodsptools_tpu developers"
release = "0.3.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.autosummary",
]
autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_mock_imports = []  # jax/numpy are real dependencies, never mocked

templates_path = []
exclude_patterns = ["_build"]
html_theme = "alabaster"
