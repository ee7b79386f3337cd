"""``hyperpyyaml`` shim for the north-star reference run.

The reference recipe (`/root/reference`) depends on the external
HyperPyYAML package, which is not installed on this host. This shim
(kept OUTSIDE the reference tree; the reference runs unmodified) maps
the two symbols SpeechBrain imports onto this repo's own
hyperpyyaml-compatible loader (``tsasr_tpu/utils/hparams.py``), which
supports the full tag set the recipes use (!new:/!name:/!apply:/!ref/
!PLACEHOLDER).
"""

import io
import sys

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from tsasr_tpu.utils.hparams import (  # noqa: F401,E402
    load_hyperpyyaml,
    parse_overrides,
)


def resolve_references(yaml_stream, overrides=None,
                       overrides_must_match=False):
    """Textual resolution used only to save the resolved
    ``hyperparams.yaml`` copy into the experiment directory
    (``core.py:92``). Overrides are appended as plain keys — cosmetic
    parity is enough; the training path loads via load_hyperpyyaml."""
    text = yaml_stream.read() if hasattr(yaml_stream, "read") \
        else str(yaml_stream)
    ov = parse_overrides(overrides)
    if ov:
        text += "\n# --- Overrides ---\n"
        for key, value in ov.items():
            text += f"{key}: {value}\n"
    return io.StringIO(text)
