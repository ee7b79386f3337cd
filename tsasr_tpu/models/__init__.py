"""flax.linen model zoo: Conformer encoder with speaker injection, LSTM
predictor, transducer joint — the TPU-native equivalents of the reference's
``models/conformer.py`` + ``speechbrain.nnet`` modules."""

from tsasr_tpu.models.attention import (  # noqa: F401
    RelPosMHAXL,
    rel_pos_encoding,
)
from tsasr_tpu.models.conformer import (  # noqa: F401
    ConformerEncoderLayer,
    ConvolutionModule,
    TSConformerEncoder,
)
from tsasr_tpu.models.frontend import ConvolutionFrontEnd  # noqa: F401
from tsasr_tpu.models.rnn import LSTM  # noqa: F401
from tsasr_tpu.models.transducer import (  # noqa: F401
    OneHotEmbedding,
    Predictor,
    TSTransducer,
)
