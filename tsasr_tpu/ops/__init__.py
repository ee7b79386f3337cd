"""Pure-JAX / Pallas compute ops.

Everything in this package is functional and jit-friendly: static shapes,
explicit PRNG keys, relative-length masking following the reference
convention of lengths in (0, 1] scaled by padded size and rounded
(``/root/reference/vendor/speechbrain/speechbrain/nnet/losses.py:58-59``).
"""

from tsasr_tpu.ops.masks import (  # noqa: F401
    length_to_mask,
    lookahead_mask,
    relative_to_absolute_lengths,
)
from tsasr_tpu.ops.features import (  # noqa: F401
    Fbank,
    FbankConfig,
    stft,
    spectral_magnitude,
    mel_filterbank_matrix,
    amplitude_to_db,
    input_normalization,
    pad_audio_to_frame_multiple,
    pad_time_frames,
)
from tsasr_tpu.ops.rnnt_loss import (  # noqa: F401
    rnnt_loss,
    rnnt_loss_reference,
    transducer_loss,
)
from tsasr_tpu.ops.losses import (  # noqa: F401
    PitWrapper,
    bce_loss,
    ctc_loss,
    kldiv_loss,
    l1_loss,
    mse_loss,
    nll_loss,
)
from tsasr_tpu.ops.normalize import InputNormalization  # noqa: F401
