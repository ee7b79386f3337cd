"""Experiment stages.

Equivalent of the reference's ``speechbrain.Stage`` enum
(``/root/reference/vendor/speechbrain/speechbrain/core.py:415-420``).
"""

from enum import Enum, auto


class Stage(Enum):
    """Current stage of an experiment: TRAIN, VALID or TEST."""

    TRAIN = auto()
    VALID = auto()
    TEST = auto()
