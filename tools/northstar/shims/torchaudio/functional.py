"""``torchaudio.functional`` shim submodule.

A real module (not a namespace attribute) so the reference's
``from torchaudio.functional import rnnt_loss``
(``speechbrain/nnet/losses.py:63``) resolves through the import system.
"""

from . import _resample as resample  # noqa: F401
from . import _rnnt_loss as rnnt_loss  # noqa: F401
