"""Minimal ruamel shim for the north-star cross-framework run.

The reference's vendored speechbrain imports ``ruamel.yaml`` at module
scope (``speechbrain/utils/train_logger.py:7``) but only *uses* it in
the WandBLogger path, which the north-star run never exercises.  This
shim satisfies the import; calling it raises.
"""

from . import yaml  # noqa: F401
