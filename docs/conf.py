# Sphinx configuration for the sparse_caption_tpu documentation.
#
# Parity with the reference's docs infra (/root/reference/docs/conf.py:
# autodoc + napoleon + myst + RTD theme), reauthored for this package.
# Build: `make -C docs html` with `pip install -r docs/requirements.txt`.

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "Sparse Image Captioning (TPU)"
copyright = "2026, sparse_caption_tpu contributors"
author = "sparse_caption_tpu contributors"

try:
    from sparse_caption_tpu import __version__ as release
except Exception:  # heavy deps (jax/flax) may be absent on the docs builder
    release = "0.0.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
    "sphinx_rtd_theme",
]

napoleon_google_docstring = True
myst_heading_anchors = 2

# jax/flax/optax are import-heavy and not needed to render signatures on
# the RTD builder; mock them so autodoc works from a plain pip env.
autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax", "einops", "torch"]

exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]

html_theme = "sphinx_rtd_theme"
