# Sphinx configuration for the azula_tpu API documentation.
#
# Built in CI (.github/workflows/ci.yaml, `docs` job) with
#   sphinx-build -W -b html docs docs/_build
# mirroring the reference's generated docs site (`/root/reference/docs/conf.py`).
# The hand-written guides (docs/*.md) and the generated per-module pages
# (tools/gen_api_docs.py) remain readable without a Sphinx build.

import azula_tpu

package = "azula_tpu"
project = "azula-tpu"
version = azula_tpu.__version__
copyright = "2026"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.intersphinx",
    "sphinx.ext.napoleon",
    "myst_parser",
]

autodoc_default_options = {
    "members": True,
    "member-order": "bysource",
    "special-members": "__call__",
}
autodoc_inherit_docstrings = False
autodoc_typehints = "description"
autodoc_typehints_format = "short"

autosummary_ignore_module_all = False

intersphinx_mapping = {
    "jax": ("https://docs.jax.dev/en/latest", None),
    "numpy": ("https://numpy.org/doc/stable", None),
    "python": ("https://docs.python.org/3", None),
}

myst_enable_extensions = ["dollarmath"]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

exclude_patterns = ["_build", "api/*.md"]

templates_path = []

try:
    import furo  # noqa: F401

    html_theme = "furo"
except ImportError:
    html_theme = "alabaster"

html_title = f"{project} {version}"
